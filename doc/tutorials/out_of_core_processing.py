"""Tutorial: out-of-core processing (lazy signals + streaming).

The TPU-native replacement for the reference's dask-backed
``LazyEBSD``: scans larger than memory load lazily (memmap/HDF5
chunk-streamed), preprocessing chains stay lazy until ``compute()``,
dictionary indexing streams chunks through the device with a carried
top-k, and long jobs checkpoint per chunk and RESUME after a crash —
a capability the reference does not have (its long jobs restart from
scratch).

Run: ``python doc/tutorials/out_of_core_processing.py``.
"""

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import kikuchipy_tpu as kp

with tempfile.TemporaryDirectory() as tmpdir:
    tmp = Path(tmpdir)

    # %% Make an on-disk scan (here small; the machinery is identical
    # at any size — see tests/test_system_scale.py for the 55x75
    # nickel_ebsd_large-shaped run).
    s = kp.data.nickel_ebsd_small()
    src = tmp / "scan.h5"
    s.save(src)

    # %% Lazy loading: data stays on disk; ops chain lazily.
    sl = kp.load(src, lazy=True)
    chain = sl.remove_static_background().remove_dynamic_background()
    out = chain.compute()  # chunks stream through the device here
    ref = s.remove_static_background().remove_dynamic_background()
    np.testing.assert_array_equal(np.asarray(out.data), np.asarray(ref.data))

    # %% Streaming preprocess-to-disk: never hold the scan in memory —
    # read chunks, map a kernel, write a VALID h5ebsd (header + crystal
    # map copied from the source).
    from kikuchipy_tpu.io.streaming import map_streamed

    bg = np.asarray(s.static_background)
    from kikuchipy_tpu.ops.pattern import remove_static_background

    dst = tmp / "preprocessed.h5"
    map_streamed(
        src,
        lambda c: np.asarray(remove_static_background(c, bg)),
        out_path=dst,
        chunk_size=4,
    )
    s2 = kp.load(dst)
    assert s2.xmap is not None  # metadata survived

    # %% Streamed dictionary indexing with checkpoint/resume: partial
    # results persist per chunk; a crashed run resumes from the last
    # completed chunk instead of restarting.
    import dataclasses

    from kikuchipy_tpu.io.streaming import dictionary_index_streamed
    from kikuchipy_tpu.crystallography.sampling import (
        sample_fundamental_zone,
    )

    mp = kp.data.nickel_ebsd_master_pattern_small(
        projection="lambert", hemisphere="both"
    )
    det = dataclasses.replace(s.detector, pc=s.detector.pc_average)
    dic = mp.get_patterns(
        sample_fundamental_zone(8.0, "m-3m"), det, dtype_out=np.float32
    )

    def preprocess(chunk):
        return np.asarray(remove_static_background(chunk, bg))

    ckpt = tmp / "di_checkpoint.npz"
    res = dictionary_index_streamed(
        src,
        np.asarray(dic.data),
        preprocess_fn=preprocess,
        chunk_size=4,
        keep_n=5,
        checkpoint_path=ckpt,  # crash-safe: resumes from here
    )
    assert res.simulation_indices.shape == (9, 5)
    print("streamed DI top-1 scores:", np.round(res.scores[:, 0], 3))

    # %% Lazy binary readers: the NORDIF/EDAX/Oxford binary readers
    # memmap with ``lazy=True`` instead of reading eagerly (the
    # reference memmaps too; here the lazy signal then chunk-streams
    # every op).
    p_dat = tmp / "Pattern.dat"
    s.save(p_dat)
    sl2 = kp.load(
        p_dat, scan_size=(3, 3), pattern_size=(60, 60), lazy=True
    )
    np.testing.assert_array_equal(
        np.asarray(sl2.compute().data).reshape(s.data.shape),
        np.asarray(s.data),
    )

print("out_of_core_processing tutorial OK")
