"""Master pattern signals and dictionary generation.

TPU-native equivalent of the reference's ``EBSDMasterPattern``
(``/root/reference/src/kikuchipy/signals/ebsd_master_pattern.py:48``) and
``ECPMasterPattern``: holds the square-Lambert (or stereographic)
hemispheres and projects dictionaries of simulated patterns onto a
detector in device-sized batches.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from kikuchipy_tpu.crystallography.crystal_map import CrystalMap, Phase, PhaseList
from kikuchipy_tpu.geometry.detector import EBSDDetector
from kikuchipy_tpu.projection.master_pattern import (
    direction_cosines_from_detector,
    project_patterns,
)
from kikuchipy_tpu.signals.ebsd import EBSD
from kikuchipy_tpu.utils.dtypes import get_dtype_range

__all__ = ["EBSDMasterPattern", "ECPMasterPattern"]


@dataclasses.dataclass(repr=False)
class KikuchiMasterPattern:
    """Base master-pattern signal.

    Attributes
    ----------
    data
        Master pattern array: ``(npy, npx)`` for one hemisphere or
        ``(2, npy, npx)`` for both (upper first); an extra leading
        energy axis is allowed: ``(n_energy, [2,] npy, npx)``.
    phase
        The crystal :class:`Phase`.
    hemisphere
        "upper", "lower", or "both".
    projection
        "lambert" (square Lambert) or "stereographic".
    energies
        Optional array of accelerating voltages (kV), one per energy bin.
    """

    data: np.ndarray
    phase: Phase = dataclasses.field(default_factory=Phase)
    hemisphere: str = "both"
    projection: str = "lambert"
    energies: np.ndarray | None = None
    metadata: dict = dataclasses.field(default_factory=dict)

    @property
    def signal_shape(self) -> tuple[int, int]:
        return tuple(self.data.shape[-2:])

    # Inherited-signal ops (the reference's KikuchipySignal2D methods,
    # ``signals/_kikuchipy_signal.py``); each returns a new signal with
    # the op applied per 2D pattern over any leading axes.

    def _apply_op(self, fn) -> "KikuchiMasterPattern":
        data = np.asarray(self.data)
        flat = data.reshape((-1,) + data.shape[-2:])
        out = np.asarray(fn(flat)).reshape(
            data.shape[:-2] + data.shape[-2:]
        )
        return dataclasses.replace(self, data=out)

    def rescale_intensity(self, **kwargs) -> "KikuchiMasterPattern":
        from kikuchipy_tpu.ops import pattern as _ops

        return self._apply_op(lambda d: _ops.rescale_intensity(d, **kwargs))

    def normalize_intensity(self, **kwargs) -> "KikuchiMasterPattern":
        from kikuchipy_tpu.ops import pattern as _ops

        return self._apply_op(lambda d: _ops.normalize_intensity(d, **kwargs))

    def adaptive_histogram_equalization(
        self, **kwargs
    ) -> "KikuchiMasterPattern":
        from kikuchipy_tpu.ops.ahe import adaptive_histogram_equalization

        return self._apply_op(
            lambda d: adaptive_histogram_equalization(d, **kwargs)
        )

    def change_dtype(self, dtype) -> "KikuchiMasterPattern":
        """Return the master pattern with data cast to ``dtype`` (the
        reference's in-place HyperSpy ``change_dtype``; here a new
        signal is returned like all other operations)."""
        return dataclasses.replace(
            self, data=np.asarray(self.data).astype(np.dtype(dtype))
        )

    def deepcopy(self) -> "KikuchiMasterPattern":
        import copy

        return copy.deepcopy(self)

    def as_lazy(self) -> "KikuchiMasterPattern":
        """Reference-compat shim (laziness is replaced by jit staging);
        returns ``self``."""
        return self

    def compute(self) -> "KikuchiMasterPattern":
        """Reference-compat shim (arrays are always concrete); returns
        ``self``."""
        return self

    def set_signal_type(self, signal_type: str):
        """Reference-compat shim for HyperSpy's signal-type switching:
        returns this signal converted to the requested class
        (``"EBSDMasterPattern"``, ``"ECPMasterPattern"``, or ``"EBSD"``).
        """
        name = signal_type.replace(" ", "").lower()
        if name == "ebsd":
            return EBSD(data=np.asarray(self.data))
        targets = {
            "ebsdmasterpattern": EBSDMasterPattern,
            "ecpmasterpattern": ECPMasterPattern,
        }
        cls = targets.get(name)
        if cls is None:
            raise ValueError(f"Unknown signal type {signal_type!r}")
        return cls(
            **{
                f.name: getattr(self, f.name)
                for f in dataclasses.fields(cls)
            }
        )

    def _hemispheres_at_energy(self, energy: float | None = None) -> np.ndarray:
        """Return packed hemispheres ``(2, npy, npx)`` at the requested
        energy (highest if not given; reference
        ``_kikuchi_master_pattern.py`` energy selection)."""
        data = np.asarray(self.data)
        # Normalize to (n_energy, n_hemi, npy, npx)
        if data.ndim == 2:
            data = data[None, None]
        elif data.ndim == 3:
            if self.hemisphere == "both":
                data = data[None]  # (2, y, x) -> 1 energy
            else:
                data = data[:, None]  # (E, y, x) one hemisphere
        elif data.ndim != 4:
            raise ValueError(f"Cannot interpret master pattern shape {data.shape}")

        if self.energies is not None and energy is not None:
            i = int(np.abs(np.asarray(self.energies) - energy).argmin())
        else:
            i = data.shape[0] - 1  # highest energy
        sel = data[i]
        if sel.shape[0] == 1:
            sel = np.concatenate([sel, sel], axis=0)
        return sel

    def as_lambert(self, show_progressbar=None) -> "KikuchiMasterPattern":
        """Re-project a stereographic master pattern onto the square
        Lambert grid (reference ``KikuchiMasterPattern.as_lambert``,
        ``signals/_kikuchi_master_pattern.py:135``): each Lambert grid
        point maps to the sphere and is bilinearly sampled from the
        stereographic image."""
        import dataclasses

        from kikuchipy_tpu.geometry.lambert import lambert_to_vector

        del show_progressbar  # reference compatibility; op is one program
        if self.projection == "lambert":
            return self
        data = np.asarray(self.data, dtype=np.float64)
        npy, npx = data.shape[-2:]
        lead = data.shape[:-2]
        flat = data.reshape((-1, npy, npx))

        # Lambert grid in [-1, 1]
        yy, xx = np.meshgrid(
            np.linspace(-1, 1, npy), np.linspace(-1, 1, npx), indexing="ij"
        )
        v = np.asarray(
            lambert_to_vector(jnp.asarray(np.stack([xx, yy], axis=-1)))
        )
        v = v / np.linalg.norm(v, axis=-1, keepdims=True)
        out = np.empty_like(flat)
        for idx in range(flat.shape[0]):
            # Upper-hemisphere images use +z; when this signal holds
            # both hemispheres the second image is the lower one.
            lower = self.hemisphere == "lower" or (
                self.hemisphere == "both" and flat.shape[0] == 2 and idx == 1
            )
            vz = -v[..., 2] if lower else v[..., 2]
            # Stereographic projection from the opposite pole:
            # (X, Y) = (x, y) / (1 + |z|), grid spans [-1, 1].
            denom = 1.0 + np.abs(vz)
            sx_ = v[..., 0] / denom
            sy_ = v[..., 1] / denom
            px = (sx_ + 1) / 2 * (npx - 1)
            py = (sy_ + 1) / 2 * (npy - 1)
            x0 = np.clip(np.floor(px).astype(int), 0, npx - 2)
            y0 = np.clip(np.floor(py).astype(int), 0, npy - 2)
            fx = px - x0
            fy = py - y0
            img = flat[idx]
            out[idx] = (
                img[y0, x0] * (1 - fy) * (1 - fx)
                + img[y0, x0 + 1] * (1 - fy) * fx
                + img[y0 + 1, x0] * fy * (1 - fx)
                + img[y0 + 1, x0 + 1] * fy * fx
            )
        return dataclasses.replace(
            self,
            data=out.reshape(lead + (npy, npx)).astype(
                np.asarray(self.data).dtype
                if np.issubdtype(np.asarray(self.data).dtype, np.floating)
                else np.float32
            ),
            projection="lambert",
        )

    def plot_spherical(
        self,
        energy: float | None = None,
        style: str = "surface",
        return_figure: bool = False,
        **kwargs,
    ):
        """Plot the master pattern on the sphere (reference
        ``KikuchiMasterPattern.plot_spherical``,
        ``signals/_kikuchi_master_pattern.py:215`` — pyvista there,
        matplotlib 3D here, so it works headless).

        Requires the stereographic projection with both hemispheres.
        """
        if self.projection != "stereographic":
            raise ValueError(
                "plot_spherical requires the stereographic projection "
                f"(signal is {self.projection!r}); load with "
                "projection='stereographic'"
            )
        if self.hemisphere != "both":
            raise ValueError(
                "plot_spherical requires both hemispheres (signal has "
                f"{self.hemisphere!r})"
            )
        from kikuchipy_tpu.draw.sphere import plot_master_pattern_sphere

        hemis = self._hemispheres_at_energy(energy)
        fig = plot_master_pattern_sphere(
            hemis[0], hemis[1], style=style, **kwargs
        )
        if return_figure:
            return fig

    def plot(self, energy: float | None = None, ax=None):
        """Show the (upper-hemisphere) master pattern."""
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots()
        img = self._hemispheres_at_energy(energy)[0]
        ax.imshow(np.asarray(img), cmap="gray")
        ax.set_title(f"{self.phase.name} ({self.projection})")
        return ax

    def __repr__(self) -> str:
        return (
            f"{type(self).__name__}(shape={self.data.shape}, "
            f"phase={self.phase.name!r}, hemisphere={self.hemisphere!r}, "
            f"projection={self.projection!r})"
        )


@dataclasses.dataclass(repr=False)
class EBSDMasterPattern(KikuchiMasterPattern):
    """EBSD master pattern with dictionary generation."""

    def get_patterns(
        self,
        rotations: np.ndarray,
        detector: EBSDDetector,
        energy: float | None = None,
        dtype_out=np.float32,
        chunk_size: int = 1024,
        signal_mask: np.ndarray | None = None,
        compute: bool = True,
        show_progressbar=None,
    ) -> EBSD:
        """Project simulated patterns for ``rotations`` onto
        ``detector`` (reference ``signals/ebsd_master_pattern.py:97-329``).

        Parameters
        ----------
        rotations
            Unit quaternions ``(n, 4)`` (or ``(ny, nx, 4)``).
        detector
            Detector with one PC (shared) or one PC per rotation.
        energy
            Accelerating voltage (kV) selecting the master pattern
            energy bin; highest if not given.
        dtype_out
            Output dtype; integer dtypes rescale each pattern to the
            dtype range (reference behavior: rescale iff
            ``dtype_out != master.dtype``).
        chunk_size
            Rotations per device batch.

        Returns
        -------
        EBSD signal of shape ``rotations.shape[:-1] + detector.shape``
        with an xmap holding the rotations.
        """
        if self.projection != "lambert":
            raise ValueError(
                "Master pattern must be in the square Lambert projection"
            )
        rotations = np.asarray(rotations)
        nav_shape = rotations.shape[:-1]
        rot_flat = rotations.reshape(-1, 4)
        n = rot_flat.shape[0]

        if detector.navigation_size not in (1, n):
            raise ValueError(
                "detector must have exactly one projection center, or as "
                f"many as there are rotations ({n}); it has "
                f"{detector.navigation_size}"
            )

        master = self._hemispheres_at_energy(energy)
        dtype_out = np.dtype(dtype_out)
        rescale = dtype_out != master.dtype
        if rescale:
            out_min, out_max = get_dtype_range(dtype_out)
        else:
            out_min, out_max = 0.0, 1.0

        npy, npx = master.shape[-2:]
        scale = (npx - 1) / 2
        master_dev = jnp.asarray(master, dtype=jnp.float32)
        dc = direction_cosines_from_detector(detector, signal_mask=signal_mask)

        sig_shape = detector.shape
        out = np.empty((n,) + sig_shape, dtype=dtype_out)
        # Multi-PC direction cosines are (n, n_pixels, 3); a single-PC
        # set is (n_pixels, 3) and shared by all rotations.
        per_pc = dc.ndim == 3
        for start in range(0, n, chunk_size):
            end = min(start + chunk_size, n)
            dc_block = dc[start:end] if per_pc else dc
            block = project_patterns(
                jnp.asarray(rot_flat[start:end], dtype=jnp.float32),
                dc_block,
                master_dev,
                npx,
                npy,
                scale,
                rescale=rescale,
                out_min=float(out_min),
                out_max=float(out_max),
            )
            out[start:end] = np.asarray(block, dtype=dtype_out).reshape(
                (end - start,) + sig_shape
            )

        xmap = CrystalMap(
            rotations=rot_flat,
            shape=nav_shape if nav_shape else (1,),
            phases=PhaseList(self.phase),
        )
        return EBSD(
            data=out.reshape(nav_shape + sig_shape),
            detector=detector,
            xmap=xmap,
        )

    def projector(
        self,
        detector: EBSDDetector,
        energy: float | None = None,
        signal_mask: np.ndarray | None = None,
    ):
        """Return a jittable ``project_fn(rotations) -> (n, n_pixels)``
        closure for fused dictionary-generation-and-matching (see
        :func:`kikuchipy_tpu.indexing.di.dictionary_index`)."""
        if detector.navigation_size != 1:
            raise ValueError("projector requires a single-PC detector")
        master = self._hemispheres_at_energy(energy)
        npy, npx = master.shape[-2:]
        scale = (npx - 1) / 2
        master_dev = jnp.asarray(master, dtype=jnp.float32)
        dc = direction_cosines_from_detector(detector, signal_mask=signal_mask)

        def project_fn(rot_block: jnp.ndarray) -> jnp.ndarray:
            return project_patterns(
                jnp.asarray(rot_block, dtype=jnp.float32),
                dc,
                master_dev,
                npx,
                npy,
                scale,
            )

        return project_fn

    def spherical_projector(
        self, energy: float | None = None, L: int = 88
    ):
        """Spherical-harmonic projector of this master pattern (see
        :class:`kikuchipy_tpu.projection.spherical.SphericalProjector`):
        a one-time harmonic analysis (cached per ``(energy, L)``) after
        which pattern synthesis at fixed detector directions is pure
        matmuls — the fast projector for orientation refinement
        (``EBSD.refine_orientation(..., projector="spherical")``).

        ``L`` is the band limit: features of ~180/L degrees are
        resolved. Measured agreement with the bilinear projector on the
        401 px nickel master: NCC ~0.89 at L = 88 and ~0.98 at L = 180
        (``tests/test_spherical.py``) — the sharp band edges carry real
        high-frequency power, so band-limited patterns are smoothed,
        not wrong. The accuracy contract for refinement through this
        projector is the <0.8 degree orientation criterion (pinned in
        ``tests/test_refinement.py``), not pattern-level NCC.
        """
        from kikuchipy_tpu.projection.spherical import SphericalProjector

        if self.projection != "lambert":
            raise ValueError(
                "spherical_projector requires a square-Lambert master "
                "pattern (use as_lambert() first)"
            )
        cache = getattr(self, "_sh_cache", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_sh_cache", cache)
        key = (energy, L)
        if key not in cache:
            master = self._hemispheres_at_energy(energy)
            cache[key] = SphericalProjector.from_master(
                np.asarray(master, dtype=np.float32), L=L
            )
        return cache[key]


@dataclasses.dataclass(repr=False)
class ECPMasterPattern(KikuchiMasterPattern):
    """Electron channeling pattern master pattern (reference
    ``signals/ecp_master_pattern.py:34``)."""
