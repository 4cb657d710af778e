"""Out-of-core scan streaming: process scans larger than device (or
host) memory by overlapping chunked HDF5 reads with device compute.

The TPU-native replacement for the reference's ``LazyEBSD``/Dask lazy
evaluation (``/root/reference/src/kikuchipy/signals/ebsd.py:3186`` and
``signals/util/_dask.py``): instead of a lazy task graph, a background
prefetch thread reads navigation chunks from disk while the device
processes the previous chunk (double buffering across the host-device
boundary).
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Callable, Iterator

import numpy as np

__all__ = ["stream_patterns", "map_streamed", "dictionary_index_streamed"]


def stream_patterns(
    filename: str | Path,
    dataset: str = "Scan 1/EBSD/Data/patterns",
    chunk_size: int = 1024,
    prefetch: int = 2,
) -> Iterator[tuple[int, np.ndarray]]:
    """Yield ``(start_index, chunk)`` of flattened-navigation pattern
    chunks from an HDF5 dataset, with a background reader thread
    prefetching ``prefetch`` chunks ahead.
    """
    import h5py

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def reader():
        try:
            with h5py.File(filename, "r") as f:
                ds = f[dataset]
                n = ds.shape[0]
                for start in range(0, n, chunk_size):
                    if stop.is_set():
                        return
                    q.put((start, ds[start : start + chunk_size][()]))
        finally:
            q.put(None)

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            yield item
    finally:
        stop.set()
        # Drain so the reader can exit.
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5)


def map_streamed(
    filename: str | Path,
    fn: Callable[[np.ndarray], np.ndarray],
    out: np.ndarray | None = None,
    dataset: str = "Scan 1/EBSD/Data/patterns",
    chunk_size: int = 1024,
    out_path: str | Path | None = None,
    out_dataset: str = "Scan 1/EBSD/Data/patterns",
    copy_metadata: bool = True,
) -> np.ndarray | None:
    """Apply a (jitted) per-chunk function over a streamed scan.

    Results are written into ``out`` (preallocated array), or streamed
    to ``out_path`` (HDF5, created on first chunk) when the result does
    not fit in memory, or collected into a new array otherwise.

    This is the out-of-core "preprocess a scan larger than host RAM and
    save it back" path (the reference does this through ``LazyEBSD`` +
    Dask lazy saves, ``/root/reference/src/kikuchipy/signals/ebsd.py:
    3186``): only one chunk of input and one of output are ever in
    memory. With ``copy_metadata`` (default), every group/dataset of the
    input file EXCEPT the pattern dataset is copied into ``out_path``,
    so preprocessing an h5ebsd scan yields a valid, loadable h5ebsd
    scan (header, PCs, crystal map and all).
    """
    import h5py

    collected = []
    h5out = None
    out_ds = None
    try:
        for start, chunk in stream_patterns(
            filename, dataset=dataset, chunk_size=chunk_size
        ):
            result = np.asarray(fn(chunk))
            if out is not None:
                out[start : start + result.shape[0]] = result
            elif out_path is not None:
                if h5out is None:
                    h5out = h5py.File(out_path, "w")
                    with h5py.File(filename, "r") as fin:
                        n = fin[dataset].shape[0]
                        if copy_metadata:
                            _copy_h5_except(fin, h5out, skip=dataset)
                    out_ds = h5out.create_dataset(
                        out_dataset,
                        shape=(n,) + result.shape[1:],
                        dtype=result.dtype,
                    )
                out_ds[start : start + result.shape[0]] = result
            else:
                collected.append(result)
    finally:
        if h5out is not None:
            h5out.close()
    if out is not None:
        return out
    if out_path is not None:
        return None
    return np.concatenate(collected, axis=0)


def _copy_h5_except(fin, fout, skip: str) -> None:
    """Copy all groups/datasets/attrs of ``fin`` into ``fout`` except
    the (possibly nested) dataset path ``skip``."""
    skip_parts = skip.strip("/").split("/")

    def visit(src, dst, parts):
        for key, item in src.items():
            if parts and key == parts[0]:
                if len(parts) == 1:
                    continue  # the pattern dataset itself
                sub = dst.require_group(key)
                for a, v in item.attrs.items():
                    sub.attrs[a] = v
                visit(item, sub, parts[1:])
                continue
            src.copy(key, dst, name=key)
        for a, v in src.attrs.items():
            dst.attrs[a] = v

    visit(fin, fout, skip_parts)


def dictionary_index_streamed(
    filename: str | Path,
    dictionary,
    preprocess_fn: Callable[[np.ndarray], np.ndarray] | None = None,
    dataset: str = "Scan 1/EBSD/Data/patterns",
    chunk_size: int = 4096,
    keep_n: int = 20,
    metric: str = "ncc",
    signal_mask: np.ndarray | None = None,
    checkpoint_path: str | Path | None = None,
    preprocess_on_device: bool = False,
    **di_kwargs,
):
    """Index a scan too large for device memory: stream experimental
    chunks from disk (prefetch overlapped with compute), index each
    chunk against the dictionary, and concatenate results.

    With ``checkpoint_path``, partial results are saved after each chunk
    (npz) and a restarted run resumes from the last completed chunk —
    the long-job restart-from-scratch gap of the reference (SURVEY.md
    §5 "failure detection").

    With ``preprocess_on_device``, ``preprocess_fn`` is applied to the
    chunk AFTER the host->device transfer (it must be a jax-compatible
    function, e.g. composed of :mod:`kikuchipy_tpu.ops`), so raw uint8
    chunks ship 4x fewer bytes over the host link than float32 —
    host->device bandwidth, not compute, bounds streaming throughput.

    Returns a :class:`~kikuchipy_tpu.indexing.di.
    DictionaryIndexingResult` covering the full scan.
    """
    import time

    import jax.numpy as jnp

    from kikuchipy_tpu.indexing.di import (
        DictionaryIndexingResult,
        PreparedDictionary,
        _default_tile,
        _index_resident,
    )
    from kikuchipy_tpu.indexing.metrics import get_metric, signal_mask_to_idx

    chunks: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    done_starts: set[int] = set()
    if checkpoint_path is not None and Path(checkpoint_path).exists():
        ckpt = np.load(checkpoint_path, allow_pickle=False)
        for key in ckpt.files:
            if key.startswith("scores_"):
                start = int(key.split("_")[1])
                chunks[start] = (ckpt[key], ckpt[f"idx_{start}"])
                done_starts.add(start)

    # Prepare the dictionary ON DEVICE ONCE (the previous implementation
    # re-prepared it for every chunk via dictionary_index); a
    # PreparedDictionary skips even that and reuses preparation across
    # scans.
    metric_obj = get_metric(metric)
    if isinstance(dictionary, PreparedDictionary):
        if dictionary.metric_name != metric_obj.name:
            raise ValueError(
                f"PreparedDictionary was prepared with metric "
                f"{dictionary.metric_name!r}, requested {metric_obj.name!r}"
            )
        dict_prepared = dictionary.prepared
        sig_size = None
        keep_idx = (
            None
            if signal_mask is None
            else jnp.asarray(
                signal_mask_to_idx(signal_mask, int(np.asarray(signal_mask).size))
            )
        )
    else:
        dict_arr = jnp.asarray(dictionary)
        sig_size = int(np.prod(dict_arr.shape[1:]))
        keep_idx = signal_mask_to_idx(signal_mask, sig_size)
        keep_idx = None if keep_idx is None else jnp.asarray(keep_idx)
        dict_prepared = metric_obj.prepare(dict_arr, keep_idx)
    m = dict_prepared.shape[0]
    keep_n_eff = min(keep_n, m)
    tile = min(
        di_kwargs.pop("n_per_iteration", None) or _default_tile(chunk_size), m
    )
    precision = di_kwargs.pop("precision", "highest")
    approx = di_kwargs.pop("approx_topk", False)
    if di_kwargs:
        raise TypeError(f"Unknown arguments: {sorted(di_kwargs)}")
    dict_q = dict_scale = None
    if precision == "int8" and isinstance(dictionary, PreparedDictionary):
        dict_q, dict_scale = dictionary.quantized_int8()

    # Host preprocessing runs in a pipeline thread so it overlaps device
    # compute; device dispatch is async, and results are synced with a
    # one-chunk lag so the checkpoint write of chunk i overlaps the
    # matmuls of chunk i+1.
    def produce():
        for start, chunk in stream_patterns(
            filename, dataset=dataset, chunk_size=chunk_size
        ):
            if start in done_starts:
                continue
            if preprocess_fn is not None and not preprocess_on_device:
                chunk = preprocess_fn(chunk)
            yield start, chunk

    def checkpoint():
        if checkpoint_path is None:
            return
        payload = {}
        for s0, (sc, ix) in chunks.items():
            payload[f"scores_{s0}"] = np.asarray(sc)
            payload[f"idx_{s0}"] = np.asarray(ix)
        tmp = Path(str(checkpoint_path) + ".tmp")
        with open(tmp, "wb") as fh:
            np.savez(fh, **payload)
        tmp.replace(checkpoint_path)

    total = 0
    t0 = time.perf_counter()
    pending: tuple[int, object, object] | None = None
    for start, chunk in _pipelined(produce(), depth=2):
        chunk_dev = jnp.asarray(chunk)
        if preprocess_fn is not None and preprocess_on_device:
            chunk_dev = preprocess_fn(chunk_dev)
        exp_prepared = metric_obj.prepare(chunk_dev, keep_idx)
        scores_d, idx_d = _index_resident(
            exp_prepared,
            dict_prepared,
            keep_n_eff,
            min(tile, m),
            precision,
            approx,
            dict_q,
            dict_scale,
        )
        if pending is not None:
            s_prev, sc_prev, ix_prev = pending
            chunks[s_prev] = (np.asarray(sc_prev), np.asarray(ix_prev))
            total += chunks[s_prev][0].shape[0]
            checkpoint()
        pending = (start, scores_d, idx_d)
    if pending is not None:
        s_prev, sc_prev, ix_prev = pending
        chunks[s_prev] = (np.asarray(sc_prev), np.asarray(ix_prev))
        total += chunks[s_prev][0].shape[0]
        checkpoint()
    dt = time.perf_counter() - t0

    starts = sorted(chunks)
    return DictionaryIndexingResult(
        scores=np.concatenate([chunks[s][0] for s in starts], axis=0),
        simulation_indices=np.concatenate(
            [chunks[s][1] for s in starts], axis=0
        ),
        patterns_per_second=total / dt if total else 0.0,
        comparisons_per_second=total * m / dt if total else 0.0,
    )


def _pipelined(it: Iterator, depth: int = 2) -> Iterator:
    """Run an iterator's work in a background thread with a bounded
    queue, so producing the next item (disk read + host preprocess)
    overlaps consuming the current one (device compute)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    error: list[BaseException] = []

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as exc:  # propagate to consumer
            error.append(exc)
        finally:
            q.put(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is None:
            break
        yield item
    t.join(timeout=10)
    if error:
        raise error[0]
