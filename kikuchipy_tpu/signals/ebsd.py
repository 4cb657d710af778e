"""User-facing EBSD scan object.

The TPU-native replacement for the reference's HyperSpy-based ``EBSD``
signal (``/root/reference/src/kikuchipy/signals/ebsd.py:118``): a thin
dataclass over a batched pattern array plus the custom attributes the
reference preserves through operations (``detector``, ``xmap``,
``static_background``; reference ``ebsd.py:186-263``). All compute
delegates to the pure-function kernel library in
:mod:`kikuchipy_tpu.ops`; there is no lazy/eager subclass split — jit
and sharding replace Dask laziness.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax.numpy as jnp

from kikuchipy_tpu.crystallography.crystal_map import CrystalMap, Phase, PhaseList
from kikuchipy_tpu.geometry.detector import EBSDDetector
from kikuchipy_tpu.indexing.di import dictionary_index
from kikuchipy_tpu.ops import pattern as _ops

__all__ = ["EBSD"]


@dataclasses.dataclass
class EBSD:
    """A 4D EBSD scan: a navigation grid of detector patterns.

    Attributes
    ----------
    data
        Pattern array ``(ny, nx, sy, sx)`` (or ``(n, sy, sx)``).
    detector
        :class:`~kikuchipy_tpu.geometry.detector.EBSDDetector`.
    static_background
        Optional ``(sy, sx)`` static background.
    xmap
        Optional :class:`~kikuchipy_tpu.crystallography.crystal_map.
        CrystalMap` of indexing results.
    metadata
        Free-form metadata dict (vendor headers etc.).
    """

    data: Any
    detector: EBSDDetector | None = None
    static_background: np.ndarray | None = None
    xmap: CrystalMap | None = None
    metadata: dict = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        if self.detector is None:
            self.detector = EBSDDetector(shape=self.signal_shape)

    # ------------------------- Shape helpers ------------------------- #

    @property
    def signal_shape(self) -> tuple[int, int]:
        return tuple(self.data.shape[-2:])

    @property
    def navigation_shape(self) -> tuple[int, ...]:
        return tuple(self.data.shape[:-2])

    @property
    def navigation_size(self) -> int:
        return int(np.prod(self.navigation_shape)) if self.navigation_shape else 1

    def _replace_data(self, data) -> "EBSD":
        return dataclasses.replace(self, data=data)

    # ------------------------ inav / isig ---------------------------- #

    @property
    def inav(self) -> "_NavIndexer":
        """Navigation-axis indexer with HyperSpy's axis order — keys
        are (x, y), i.e. ``s.inav[x, y]`` selects map column x, row y
        (reference signals inherit this from HyperSpy). Per-point
        detector PCs and the crystal-map rotations/properties are
        sliced along."""
        return _NavIndexer(self)

    @property
    def isig(self) -> "_SigIndexer":
        """Signal-axis indexer with HyperSpy's axis order — keys are
        (x, y) detector columns/rows: ``s.isig[:, :-5]`` removes the
        bottom five detector rows. The static background is sliced
        along; the detector keeps its geometry (as in the reference,
        where ``isig`` only slices the data)."""
        return _SigIndexer(self)

    # ---------------------- Preprocessing ops ------------------------ #
    # Each returns a NEW EBSD; op semantics in kikuchipy_tpu.ops.pattern.

    def rescale_intensity(self, **kwargs) -> "EBSD":
        return self._replace_data(_ops.rescale_intensity(self.data, **kwargs))

    def normalize_intensity(self, **kwargs) -> "EBSD":
        return self._replace_data(_ops.normalize_intensity(self.data, **kwargs))

    def remove_static_background(
        self,
        operation: str = "subtract",
        static_bg: np.ndarray | None = None,
        scale_bg: bool = False,
        **kwargs,
    ) -> "EBSD":
        """Remove the static background (reference ``ebsd.py:442``)."""
        if static_bg is None:
            static_bg = self.static_background
        if static_bg is None:
            raise ValueError(
                "`static_bg` is not a valid NumPy array: none was passed and "
                "the signal has no static_background attribute"
            )
        bg = np.asarray(static_bg)
        if bg.shape != self.signal_shape:
            raise ValueError(
                f"Signal {self.signal_shape} and static background {bg.shape} "
                "shapes are not identical"
            )
        out = _ops.remove_static_background(
            self.data, bg, operation=operation, scale_bg=scale_bg, **kwargs
        )
        return self._replace_data(out)

    def remove_dynamic_background(
        self,
        operation: str = "subtract",
        filter_domain: str = "frequency",
        std: float | None = None,
        truncate: float = 4.0,
        **kwargs,
    ) -> "EBSD":
        """Remove the dynamic background (reference ``ebsd.py:575``)."""
        out = _ops.remove_dynamic_background(
            self.data,
            operation=operation,
            filter_domain=filter_domain,
            std=std,
            truncate=truncate,
            **kwargs,
        )
        return self._replace_data(out)

    def get_dynamic_background(self, **kwargs) -> "EBSD":
        return self._replace_data(_ops.get_dynamic_background(self.data, **kwargs))

    def fft_filter(
        self,
        transfer_function,
        function_domain: str = "frequency",
        shift: bool = False,
        show_progressbar=None,
    ) -> "EBSD":
        """Frequency-domain filter (reference ``ebsd.py:805``). With
        ``function_domain="spatial"``, the transfer function is a spatial
        kernel convolved via the Barnes rFFT filter."""
        del show_progressbar  # reference compatibility; op is one program
        if function_domain == "frequency":
            out = _ops.fft_filter(
                self.data.astype(jnp.float32), transfer_function, shift=shift
            )
            out = _ops.rescale_intensity(out, dtype_out=np.asarray(self.data).dtype)
        elif function_domain == "spatial":
            from kikuchipy_tpu.ops.fft_barnes import FFTFilterPlan, barnes_fft_filter

            plan = FFTFilterPlan(self.signal_shape, np.asarray(transfer_function))
            out = barnes_fft_filter(jnp.asarray(self.data, jnp.float32), plan)
            out = _ops.rescale_intensity(out, dtype_out=np.asarray(self.data).dtype)
        else:
            raise ValueError(
                f"function_domain must be 'frequency' or 'spatial', got "
                f"{function_domain!r}"
            )
        return self._replace_data(out)

    def downsample(self, factor: int, **kwargs) -> "EBSD":
        """Integer-factor binning + rescale (reference ``ebsd.py:1113``);
        adjusts the detector shape/binning and downsamples the static
        background accordingly."""
        factor = int(factor)
        sy, sx = self.signal_shape
        if factor <= 1:
            raise ValueError(f"Binning factor {factor} must be an integer > 1")
        if sy % factor or sx % factor:
            raise ValueError(
                f"Binning factor {factor} must be a divisor of the signal "
                f"shape {self.signal_shape}"
            )
        out = _ops.downsample(self.data, factor, **kwargs)
        new = self._replace_data(out)
        if self.detector is not None:
            det = self.detector
            new.detector = dataclasses.replace(
                det,
                shape=tuple(out.shape[-2:]),
                binning=det.binning * factor,
                pc=det.pc.copy(),
            )
        if self.static_background is not None:
            new.static_background = np.asarray(
                _ops.downsample(
                    jnp.asarray(self.static_background), factor, **kwargs
                )
            )
        return new

    def get_image_quality(
        self, normalize: bool = True, show_progressbar=None
    ) -> np.ndarray:
        """Image-quality map (reference ``ebsd.py:1312``).
        ``show_progressbar`` is accepted for reference compatibility
        (the op runs as one device program)."""
        del show_progressbar
        return np.asarray(_ops.get_image_quality(self.data, normalize=normalize))

    def adaptive_histogram_equalization(
        self,
        kernel_size=None,
        clip_limit: float = 0.0,
        nbins: int = 128,
        show_progressbar=None,
    ) -> "EBSD":
        del show_progressbar  # reference compatibility; op is one program
        from kikuchipy_tpu.ops.ahe import adaptive_histogram_equalization

        return self._replace_data(
            adaptive_histogram_equalization(
                self.data, kernel_size=kernel_size, clip_limit=clip_limit,
                nbins=nbins,
            )
        )

    def average_neighbour_patterns(self, window=None, **kwargs) -> "EBSD":
        from kikuchipy_tpu.ops.neighbors import average_neighbour_patterns

        return self._replace_data(
            average_neighbour_patterns(self.data, window=window, **kwargs)
        )

    def rebin(self, scale: tuple[int, ...] | None = None, **kwargs) -> "EBSD":
        """Integer-factor rebin of the signal axes (detector-attribute
        aware; reference ``ebsd.py:2773``). ``scale`` is
        ``(..., sy_factor, sx_factor)``; only equal signal factors are
        supported (use :meth:`downsample`)."""
        if scale is None:
            raise ValueError("Pass scale, e.g. (1, 1, 2, 2)")
        fy, fx = int(scale[-2]), int(scale[-1])
        if fy != fx:
            raise ValueError(
                f"Only equal signal-axis factors are supported, got {scale}"
            )
        if any(int(s) != 1 for s in scale[:-2]):
            raise ValueError("Navigation-axis rebinning is not supported")
        return self.downsample(fy, **kwargs)

    def hough_indexing_optimize_pc(
        self,
        pc0=None,
        indexer=None,
        batch: bool = False,
        method: str = "Nelder-Mead",
        phase_list=None,
        trust_region=(0.05, 0.05, 0.05),
        max_iters: int = 80,
        **hough_kwargs,
    ):
        """Optimize the projection center by maximizing the Hough
        band-fit quality (reference ``EBSD.hough_indexing_optimize_pc``,
        ``ebsd.py:1721``): search over (PCx, PCy, PCz) of the mean
        angular misfit of detected bands to their best-matching lattice
        planes.

        Parameters
        ----------
        pc0
            Initial PC guess (default: the detector's average PC).
        indexer
            A configured :class:`~kikuchipy_tpu.indexing.hough.
            HoughIndexer` (e.g. from ``detector.get_indexer``); its
            phase list and Hough parameters are used when given.
        method
            "Nelder-Mead" (default, SciPy) or "PSO" (particle swarm) —
            the reference's two supported optimizers (``ebsd.py:63-68``
            of the method body).
        batch
            With ``True``, one PC is optimized PER PATTERN (reference
            ``ebsd.py:1725,1815``): bands are detected once, the scan is
            indexed at ``pc0``, each band's pole assignment is frozen,
            and every pattern's 3-parameter search runs as one lockstep
            batched Nelder-Mead on device
            (:func:`kikuchipy_tpu.indexing.hough.optimize_pc_batched`).
            The returned detector's ``pc`` then has the navigation
            shape. ``method`` applies to the ``batch=False`` scalar
            search only.

        Returns a new :class:`EBSDDetector` with the optimized PC.
        """
        import dataclasses

        from scipy.optimize import minimize

        from kikuchipy_tpu.indexing import hough as _hough

        if batch:
            det0 = self.detector
            reflectors = None
            if indexer is not None:
                if phase_list is None:
                    phase_list = getattr(indexer, "phase_list", None)
                reflectors = getattr(indexer, "reflectors", None)
                for key, value in getattr(indexer, "kwargs", {}).items():
                    hough_kwargs.setdefault(key, value)
                det0 = getattr(indexer, "detector", None) or det0
            if pc0 is None:
                pc0 = det0.pc_average
            sig = dataclasses.replace(self, detector=det0)
            pc = _hough.optimize_pc_batched(
                sig,
                pc0=pc0,
                phase_list=phase_list,
                reflectors=reflectors,
                trust_region=trust_region,
                max_iters=max_iters,
                **hough_kwargs,
            )
            nav_shape = self.navigation_shape
            if len(nav_shape) == 2:
                pc = pc.reshape(nav_shape + (3,))
            return dataclasses.replace(det0, pc=pc)
        supported = ("nelder-mead", "pso")
        method = method.lower()
        if method not in supported:
            raise ValueError(
                f"`method` '{method}' must be one of the supported methods "
                f"{list(supported)}"
            )
        det0 = self.detector
        if indexer is not None:
            if phase_list is None:
                phase_list = getattr(indexer, "phase_list", None)
            for key, value in getattr(indexer, "kwargs", {}).items():
                hough_kwargs.setdefault(key, value)
            det0 = getattr(indexer, "detector", None) or det0
        if pc0 is None:
            pc0 = det0.pc_average
        pc0 = np.asarray(pc0, dtype=float)

        def misfit(pc):
            det = dataclasses.replace(det0, pc=np.asarray(pc))
            sig = dataclasses.replace(self, detector=det)
            xmap = _hough.hough_indexing(sig, phase_list=phase_list, **hough_kwargs)
            fit = xmap.prop["fit"]
            nb = xmap.prop["nbands"]
            # Penalize losing band inliers; reward small fit error.
            return float(np.nanmean(fit) - 0.5 * nb.mean())

        tr = np.asarray(trust_region, dtype=float)
        lo, hi = pc0 - tr, pc0 + tr
        if method == "nelder-mead":
            res = minimize(
                misfit,
                pc0,
                method="Nelder-Mead",
                bounds=list(zip(lo, hi)),
                options={"maxiter": max_iters, "xatol": 1e-4, "fatol": 1e-4},
            )
            best = res.x
        else:
            # Particle swarm (the reference delegates to pyebsdindex's
            # PSOOpt): global-best PSO with standard inertia/cognitive/
            # social coefficients, deterministic seed.
            rng = np.random.default_rng(0)
            n_particles = 12
            pos = rng.uniform(lo, hi, size=(n_particles, 3))
            pos[0] = pc0
            vel = rng.uniform(-tr, tr, size=(n_particles, 3)) * 0.1
            pbest = pos.copy()
            pbest_val = np.array([misfit(p) for p in pos])
            g = int(np.argmin(pbest_val))
            gbest, gbest_val = pbest[g].copy(), pbest_val[g]
            w, c1, c2 = 0.6, 1.5, 1.5
            for _ in range(max(1, max_iters // n_particles)):
                r1 = rng.random((n_particles, 3))
                r2 = rng.random((n_particles, 3))
                vel = (
                    w * vel
                    + c1 * r1 * (pbest - pos)
                    + c2 * r2 * (gbest - pos)
                )
                pos = np.clip(pos + vel, lo, hi)
                vals = np.array([misfit(p) for p in pos])
                improved = vals < pbest_val
                pbest[improved] = pos[improved]
                pbest_val[improved] = vals[improved]
                g = int(np.argmin(pbest_val))
                if pbest_val[g] < gbest_val:
                    gbest, gbest_val = pbest[g].copy(), pbest_val[g]
            best = gbest
        return dataclasses.replace(det0, pc=best)

    def get_neighbour_dot_product_matrices(self, window=None, **kwargs):
        """Dot-product matrices with window neighbours (reference
        ``ebsd.py:1221``)."""
        from kikuchipy_tpu.ops.neighbors import neighbour_dot_product_matrices

        return neighbour_dot_product_matrices(self.data, window=window, **kwargs)

    def get_average_neighbour_dot_product_map(self, window=None, **kwargs):
        """ADP map (reference ``ebsd.py:1377``)."""
        from kikuchipy_tpu.ops.neighbors import average_dot_product_map

        return average_dot_product_map(self.data, window=window, **kwargs)

    def get_virtual_bse_intensity(self, roi, out_signal_axes=None) -> np.ndarray:
        """Sum pattern intensities inside a detector ROI
        ``(row0, row1, col0, col1)`` (reference ``ebsd.py:1555``).
        ``out_signal_axes`` selects HyperSpy output axes in the
        reference and is accepted for compatibility (the returned map
        always spans the navigation grid here)."""
        from kikuchipy_tpu.imaging.vbse import VirtualBSEImager

        del out_signal_axes
        return VirtualBSEImager(self).get_virtual_bse_intensity(roi)

    def plot_virtual_bse_intensity(
        self, roi, out_signal_axes=None, ax=None, **imshow_kwargs
    ):
        """Plot the virtual BSE image for a detector ROI
        ``(row0, row1, col0, col1)`` (static counterpart of the
        reference's interactive ``plot_virtual_bse_intensity``,
        ``ebsd.py:1496``). Returns the matplotlib axes."""
        del out_signal_axes
        import matplotlib.pyplot as plt

        img = self.get_virtual_bse_intensity(roi)
        if ax is None:
            _, ax = plt.subplots()
        ax.imshow(img, cmap=imshow_kwargs.pop("cmap", "gray"), **imshow_kwargs)
        ax.set_title(f"Virtual BSE, ROI rows {roi[0]}:{roi[1]} cols {roi[2]}:{roi[3]}")
        ax.axis("off")
        return ax

    def _reduce(self, fn, axis) -> "EBSD":
        if axis is None:
            axis = tuple(range(len(self.navigation_shape)))
        return self._replace_data(fn(np.asarray(self.data), axis=axis))

    def mean(self, axis=None) -> "EBSD":
        """Mean over ``axis`` (default: the navigation axes, giving the
        mean pattern — HyperSpy's ``BaseSignal.mean`` default the
        reference inherits; e.g. building a static background with
        ``s.mean(axis=(0, 1))``)."""
        return self._reduce(np.mean, axis)

    def max(self, axis=None) -> "EBSD":
        return self._reduce(np.max, axis)

    def min(self, axis=None) -> "EBSD":
        return self._reduce(np.min, axis)

    def sum(self, axis=None) -> "EBSD":
        return self._reduce(np.sum, axis)

    def std(self, axis=None) -> "EBSD":
        return self._reduce(np.std, axis)

    def change_dtype(self, dtype) -> "EBSD":
        """Return the scan with patterns cast to ``dtype`` (the
        reference's in-place HyperSpy ``change_dtype``; here a new
        signal is returned like all other operations)."""
        return self._replace_data(np.asarray(self.data).astype(np.dtype(dtype)))

    def set_scan_calibration(
        self, step_x: float = 1.0, step_y: float = 1.0
    ) -> None:
        """Set the navigation step sizes in microns (reference
        ``ebsd.py:380-410``; stored in :attr:`metadata` as
        ``scan_step`` since there is no HyperSpy axes manager)."""
        self.metadata["scan_step"] = (float(step_y), float(step_x))
        self.metadata["scan_unit"] = "um"

    def set_detector_calibration(self, delta: float) -> None:
        """Set the detector pixel size in microns (reference
        ``ebsd.py:412-440``); updates :attr:`detector` and records the
        value in :attr:`metadata`."""
        self.metadata["detector_pixel_size"] = float(delta)
        if self.detector is not None:
            self.detector = dataclasses.replace(
                self.detector, px_size=float(delta)
            )

    def decomposition(
        self,
        algorithm: str = "SVD",
        output_dimension: int | None = None,
        **kwargs,
    ) -> None:
        """PCA decomposition of the patterns, storing the results on
        :attr:`learning_results` (the reference inherits HyperSpy's
        ``decomposition``; here it is a thin wrapper over
        :func:`kikuchipy_tpu.ops.decomposition.pca`).

        Parameters
        ----------
        algorithm
            Only "SVD"/"PCA" (economy SVD of the centered pattern
            matrix) is supported.
        output_dimension
            Number of components kept (default: full rank, bounded by
            64 to keep the stored results small — pass explicitly for
            more).
        """
        del kwargs  # HyperSpy compatibility (centre, normalize, ...)
        if algorithm.upper() not in ("SVD", "PCA"):
            raise ValueError(
                f"Only SVD/PCA decomposition is supported, got {algorithm!r}"
            )
        from types import SimpleNamespace

        from kikuchipy_tpu.ops.decomposition import pca

        if output_dimension is None:
            output_dimension = min(self.navigation_size, 64)
        factors, loadings, mean, var, ratio = pca(
            self.data, int(output_dimension), return_variance=True
        )
        self.learning_results = SimpleNamespace(
            factors=factors, loadings=loadings, mean=mean,
            output_dimension=int(output_dimension),
            explained_variance=var,
            explained_variance_ratio=ratio,
        )

    def get_decomposition_model(
        self, components: int | list[int] | None = 10, dtype_out=None
    ) -> "EBSD":
        """Reconstruct the scan from principal components (reference
        ``EBSD.get_decomposition_model``, ``ebsd.py:2665``): a denoising
        PCA model of the patterns.

        ``components`` may be an int (keep the first n), a list of
        component indices, or None (all). ``dtype_out`` is the model's
        data type; the default (None) rescales back to the storage
        dtype (pass ``"float32"`` for the reference's default raw
        float reconstruction).
        """
        from kikuchipy_tpu.ops.decomposition import pca_reconstruct

        if dtype_out is None:
            dtype_out = np.asarray(self.data).dtype
        data = pca_reconstruct(self.data, components, dtype_out=dtype_out)
        return self._replace_data(data)

    def get_decomposition_model_write(
        self,
        out_path,
        components: int = 10,
        chunk_size: int = 1024,
    ) -> None:
        """Write the PCA model reconstruction straight to a kikuchipy
        h5ebsd file, navigation-chunk by navigation-chunk (the
        out-of-core analogue of :meth:`get_decomposition_model`;
        reference ``LazyEBSD.get_decomposition_model_write``,
        ``signals/ebsd.py:3200``).

        The factors/loadings/mean are computed once; each reconstructed
        chunk is rescaled to the storage dtype and written before the
        next is generated, so the float32 reconstruction of the full
        scan is never materialized.
        """
        import h5py
        import jax.numpy as jnp

        from kikuchipy_tpu.io.plugins.kikuchipy_h5ebsd import file_writer
        from kikuchipy_tpu.ops.decomposition import pca
        from kikuchipy_tpu.utils.dtypes import get_dtype_range

        data = np.asarray(self.data)
        dtype = data.dtype
        sy, sx = data.shape[-2:]
        n = int(np.prod(data.shape[:-2]))
        factors, loadings, mean = pca(data, components)
        factors_d = jnp.asarray(factors)
        mean_d = jnp.asarray(mean)

        file_writer(str(out_path), self)
        with h5py.File(out_path, "r+") as f:
            ds = f["Scan 1/EBSD/Data/patterns"]
            for start in range(0, n, chunk_size):
                w = jnp.asarray(loadings[start : start + chunk_size])
                recon = w @ factors_d + mean_d
                if np.issubdtype(dtype, np.integer):
                    omin, omax = get_dtype_range(dtype)
                    imin = recon.min(axis=-1, keepdims=True)
                    imax = recon.max(axis=-1, keepdims=True)
                    recon = (recon - imin) / (imax - imin)
                    recon = recon * (omax - omin) + omin
                ds[start : start + w.shape[0]] = (
                    np.asarray(recon).astype(dtype).reshape(-1, sy, sx)
                )

    def as_lazy(self, chunk_size: int = 1024):
        """Lazy view of this scan: subsequent preprocessing ops are
        recorded and executed chunk-at-a-time (reference
        ``EBSD.as_lazy()`` → ``LazyEBSD``, ``signals/ebsd.py:3186``);
        see :class:`kikuchipy_tpu.signals.lazy.LazyEBSD`. When the data
        is an ``np.memmap`` (e.g. from the NORDIF/Oxford/EDAX binary
        readers), chunks are read from disk on demand."""
        from kikuchipy_tpu.signals.lazy import ArraySource, LazyEBSD

        return LazyEBSD(
            source=ArraySource(
                np.asarray(self.data)
                if not isinstance(self.data, (np.memmap, np.ndarray))
                else self.data,
                self.navigation_shape,
            ),
            detector=self.detector,
            static_background=self.static_background,
            xmap=self.xmap,
            metadata=dict(self.metadata),
            chunk_size=chunk_size,
        )

    def compute(self) -> "EBSD":
        """Reference-compat shim (arrays are always concrete);
        returns ``self``."""
        return self

    def hough_indexing(
        self,
        phase_list=None,
        indexer=None,
        chunksize: int | None = None,
        verbose: int = 0,
        return_index_data: bool = False,
        return_band_data: bool = False,
        **kwargs,
    ):
        """Hough/Radon band detection indexing (reference
        ``ebsd.py:1600``); see
        :func:`kikuchipy_tpu.indexing.hough.hough_indexing`.

        ``indexer``: a configured
        :class:`~kikuchipy_tpu.indexing.hough.HoughIndexer` (from
        :meth:`EBSDDetector.get_indexer`); its phase list is used when
        ``phase_list`` is not given. ``chunksize`` maps to the native
        driver's pattern chunk; with ``return_index_data`` /
        ``return_band_data`` the extra returns mirror the reference's
        PyEBSDIndex data (a ``(2, n)`` structured index-data array /
        the per-pattern refined band parameters).
        """
        from kikuchipy_tpu.indexing.hough import (
            detect_bands_refined,
            hough_indexing,
            radon_transform,
        )

        if chunksize is not None:
            kwargs.setdefault("chunk", int(chunksize))
        if indexer is not None:
            if phase_list is not None:
                kwargs["phase_list"] = phase_list
            xmap = indexer.index(self, **kwargs)
        else:
            xmap = hough_indexing(self, phase_list=phase_list, **kwargs)
        if verbose:
            fit = np.asarray(xmap.prop["fit"])
            print(
                f"Hough indexing of {xmap.size} patterns: mean fit "
                f"{np.nanmean(fit):.3f} deg, mean bands "
                f"{np.asarray(xmap.prop['nbands']).mean():.1f}"
            )
        out = (xmap,)
        if return_index_data:
            n = xmap.size
            dt = np.dtype(
                [
                    ("quat", "f8", (4,)),
                    ("phase", "i8"),
                    ("fit", "f8"),
                    ("cm", "f8"),
                    ("pq", "f8"),
                    ("nmatch", "i8"),
                ]
            )
            index_data = np.zeros((2, n), dtype=dt)
            fit = np.asarray(xmap.prop["fit"], dtype=np.float64)
            for row in range(2):
                index_data[row]["quat"] = np.asarray(xmap.best_rotations)
                index_data[row]["phase"] = np.where(np.isfinite(fit), 0, -1)
                index_data[row]["fit"] = fit
                index_data[row]["pq"] = np.asarray(
                    xmap.prop["band_intensity"], dtype=np.float64
                )
                pq = index_data[row]["pq"]
                rng = np.nanmax(pq) - np.nanmin(pq)
                index_data[row]["cm"] = (
                    (pq - np.nanmin(pq)) / rng if rng > 0 else np.ones(n)
                )
                index_data[row]["nmatch"] = np.asarray(xmap.prop["nbands"])
            out += (index_data,)
        if return_band_data:
            sino = radon_transform(self.data)
            rho, theta, intensity, width = detect_bands_refined(sino)
            band_data = {
                "rho": np.asarray(rho),
                "theta": np.asarray(theta),
                "intensity": np.asarray(intensity),
                "width": np.asarray(width),
            }
            out += (band_data,)
        return out[0] if len(out) == 1 else out

    def extract_grid(
        self,
        grid_shape: tuple[int, int] | int,
        return_indices: bool = False,
    ) -> "EBSD | tuple[EBSD, np.ndarray]":
        """Return a sub-scan of patterns on an evenly spaced grid
        (reference ``ebsd.py:267-363``; spacing/centering semantics of
        ``signals/util/array_tools.py:21-105``).

        Parameters
        ----------
        grid_shape
            ``(n_cols, n_rows)`` (signal-axes order, like the
            reference) or a single integer for 1D scans.
        return_indices
            Also return the ``(2,) + (n_rows, n_cols)`` indices of the
            extracted patterns into the navigation grid.
        """
        from kikuchipy_tpu.utils.grid import grid_indices

        nav_shape = self.navigation_shape
        if isinstance(grid_shape, int):
            grid_np = (grid_shape,)
        else:
            grid_np = tuple(grid_shape)[::-1]  # -> NumPy (rows, cols)
        idx = grid_indices(grid_np, nav_shape)
        idx_tuple = tuple(idx)
        data = np.asarray(self.data)[idx_tuple]
        xmap_new = None
        if self.xmap is not None:
            try:
                mask = np.zeros(nav_shape, dtype=bool)
                mask[idx_tuple] = True
                xmap_new = self.xmap[mask.ravel()]
            except Exception:
                xmap_new = None
        new = dataclasses.replace(self, data=data, xmap=xmap_new)
        if self.detector is not None and self.detector.navigation_shape == nav_shape:
            new.detector = dataclasses.replace(
                self.detector, pc=self.detector.pc[idx_tuple]
            )
        if return_indices:
            return new, idx
        return new

    # ------------------------- Indexing ----------------------------- #

    def dictionary_indexing(
        self,
        dictionary: "EBSD",
        metric: str = "ncc",
        keep_n: int = 20,
        n_per_iteration: int | None = None,
        signal_mask: np.ndarray | None = None,
        navigation_mask: np.ndarray | None = None,
        rechunk: bool = False,
        dtype=None,
        **kwargs,
    ) -> CrystalMap:
        """Match patterns against a dictionary signal and return a
        crystal map (reference ``ebsd.py:1827``). Extra keyword
        arguments (``precision``, ``approx_topk``, ``progress``, ...)
        pass through to
        :func:`kikuchipy_tpu.indexing.di.dictionary_index`.

        ``dtype`` sets the metric computation dtype like the
        reference's (float64 needs ``jax_enable_x64``); ``rechunk`` is
        accepted for compatibility and ignored (chunking is the
        ``n_per_iteration`` dictionary tiling here, not a Dask graph).
        """
        del rechunk
        if isinstance(metric, str) and dtype is not None:
            from kikuchipy_tpu.indexing.metrics import get_metric

            metric = dataclasses.replace(
                get_metric(metric), dtype=np.dtype(dtype)
            )
        result = dictionary_index(
            jnp.asarray(self.data),
            dictionary=jnp.asarray(dictionary.data),
            keep_n=keep_n,
            n_per_iteration=n_per_iteration,
            metric=metric,
            signal_mask=signal_mask,
            navigation_mask=navigation_mask,
            **kwargs,
        )
        dict_xmap = dictionary.xmap
        if dict_xmap is None:
            raise ValueError("dictionary has no xmap with rotations")
        idx = result.simulation_indices
        safe_idx = np.where(idx < 0, 0, idx)
        rot = dict_xmap.best_rotations[safe_idx]
        keep_n_eff = idx.shape[1]
        if keep_n_eff == 1:
            rot = rot[:, 0]
        phases = dict_xmap.phases if len(dict_xmap.phases) else PhaseList(Phase())
        nav_shape = self.navigation_shape
        return CrystalMap(
            rotations=rot,
            shape=nav_shape if len(nav_shape) == 2 else (self.navigation_size,),
            prop={
                "scores": result.scores,
                "simulation_indices": result.simulation_indices,
            },
            phases=phases,
            is_in_data=(
                ~np.asarray(navigation_mask).ravel()
                if navigation_mask is not None
                else None
            ),
        )

    def refine_orientation(self, *args, **kwargs):
        from kikuchipy_tpu.indexing.refinement import refine_orientation

        return refine_orientation(self, *args, **kwargs)

    def refine_projection_center(self, *args, **kwargs):
        from kikuchipy_tpu.indexing.refinement import refine_projection_center

        return refine_projection_center(self, *args, **kwargs)

    def refine_orientation_projection_center(self, *args, **kwargs):
        from kikuchipy_tpu.indexing.refinement import (
            refine_orientation_projection_center,
        )

        return refine_orientation_projection_center(self, *args, **kwargs)

    # --------------------------- Utility ----------------------------- #

    def crop(self, extent: tuple[int, int, int, int]) -> "EBSD":
        """Crop the detector (signal) axes to
        ``(row0, row1, col0, col1)`` end-exclusive, adjusting detector
        geometry and static background (reference ``ebsd.py:2726``)."""
        r0, r1, c0, c1 = extent
        data = np.asarray(self.data)[..., r0:r1, c0:c1]
        new = dataclasses.replace(self, data=data)
        if self.detector is not None:
            new.detector = self.detector.crop(extent)
        if self.static_background is not None:
            new.static_background = np.asarray(self.static_background)[
                r0:r1, c0:c1
            ]
        return new

    def deepcopy(self) -> "EBSD":
        """Return a true deep copy (reference: HyperSpy ``deepcopy``,
        which copies the data AND the custom attributes ``detector``,
        ``xmap`` and ``static_background``; mutating the copy must not
        touch the original)."""
        import copy

        new = dataclasses.replace(self, data=np.array(np.asarray(self.data)))
        new.detector = copy.deepcopy(self.detector)
        new.xmap = copy.deepcopy(self.xmap)
        if self.static_background is not None:
            new.static_background = np.array(np.asarray(self.static_background))
        new.metadata = copy.deepcopy(self.metadata)
        return new

    def save(self, filename, **kwargs) -> None:
        from kikuchipy_tpu.io import save

        save(filename, self, **kwargs)

    def plot(
        self,
        navigator: str | np.ndarray = "iq",
        pattern_idx: tuple[int, ...] | None = None,
        return_figure: bool = False,
    ):
        """Plot a navigator map (image quality / mean intensity / custom
        array) alongside one pattern (minimal replacement for HyperSpy's
        interactive signal plot)."""
        import matplotlib.pyplot as plt

        data = np.asarray(self.data)
        if pattern_idx is None:
            pattern_idx = tuple(v // 2 for v in self.navigation_shape)
        if isinstance(navigator, str):
            if navigator == "iq":
                nav = self.get_image_quality()
            elif navigator == "mean":
                nav = data.mean(axis=(-2, -1))
            else:
                raise ValueError(
                    f"navigator must be 'iq', 'mean' or an array, got "
                    f"{navigator!r}"
                )
        else:
            nav = np.asarray(navigator)
        fig, (ax0, ax1) = plt.subplots(ncols=2, figsize=(9, 4))
        im = ax0.imshow(np.atleast_2d(nav), cmap="gray")
        fig.colorbar(im, ax=ax0)
        yx = pattern_idx if len(pattern_idx) == 2 else (0, pattern_idx[0])
        ax0.scatter([yx[1]], [yx[0]], marker="s", s=80, facecolor="none",
                    edgecolor="r")
        ax0.set_title("navigator")
        ax1.imshow(data[pattern_idx], cmap="gray")
        ax1.set_title(f"pattern {pattern_idx}")
        if return_figure:
            return fig
        return ax0, ax1

    def __repr__(self) -> str:
        return (
            f"EBSD(nav={self.navigation_shape}, sig={self.signal_shape}, "
            f"dtype={np.asarray(self.data).dtype})"
        )


class _NavIndexer:
    """``EBSD.inav`` implementation (HyperSpy x-first key order)."""

    def __init__(self, signal: EBSD):
        self._signal = signal

    def __getitem__(self, key) -> EBSD:
        s = self._signal
        nav_shape = s.navigation_shape
        nav_dim = len(nav_shape)
        if not isinstance(key, tuple):
            key = (key,)
        if len(key) > nav_dim:
            raise IndexError(
                f"Too many navigation indices {key} for navigation shape "
                f"{nav_shape}"
            )
        key = key + (slice(None),) * (nav_dim - len(key))
        # HyperSpy order: first key is x (fastest axis) = last nav axis.
        array_key = tuple(reversed(key))

        data = np.asarray(s.data)[array_key]
        new = dataclasses.replace(s, data=data)

        det = s.detector
        if det is not None and det.pc.ndim > 2 and det.pc.shape[:-1] == nav_shape:
            new.detector = dataclasses.replace(
                det, pc=np.atleast_2d(det.pc[array_key])
            )
        if s.xmap is not None and s.xmap.size == int(np.prod(nav_shape)):
            mask = np.zeros(nav_shape, dtype=bool)
            mask[array_key] = True
            sub = s.xmap[mask.ravel()]
            new_nav = data.shape[:-2]
            if new_nav and int(np.prod(new_nav)) == sub.size:
                sub = dataclasses.replace(sub, shape=tuple(new_nav))
            new.xmap = sub
        return new


class _SigIndexer:
    """``EBSD.isig`` implementation (HyperSpy x-first key order)."""

    def __init__(self, signal: EBSD):
        self._signal = signal

    def __getitem__(self, key) -> EBSD:
        s = self._signal
        if not isinstance(key, tuple):
            key = (key,)
        if len(key) > 2:
            raise IndexError(f"Too many signal indices {key}")
        key = key + (slice(None),) * (2 - len(key))
        kx, ky = key
        data = np.asarray(s.data)[..., ky, kx]
        new = dataclasses.replace(s, data=data)
        if s.static_background is not None:
            new.static_background = np.asarray(s.static_background)[ky, kx]
        return new
