"""Sharded dictionary indexing over a device mesh.

Runs on any device count: real TPU chips, or a virtual CPU mesh via
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS"):
    # The axon sitecustomize force-overrides jax_platforms at
    # interpreter start; honor the explicitly requested env value so
    # JAX_PLATFORMS=cpu really runs on (virtual) CPU devices.
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import kikuchipy_tpu as kp
from kikuchipy_tpu.crystallography.sampling import sample_fundamental_zone
from kikuchipy_tpu.parallel.mesh import make_mesh, sharded_dictionary_index


def main() -> None:
    n = len(jax.devices())
    n_dict = 2 if n % 2 == 0 and n > 1 else 1
    mesh = make_mesh(n_scan=n // n_dict, n_dict=n_dict)
    print("mesh:", dict(mesh.shape))

    s = kp.data.nickel_ebsd_small().remove_static_background()
    mp = kp.data.nickel_ebsd_master_pattern_small(
        projection="lambert", hemisphere="both"
    )
    det = kp.detectors.EBSDDetector(
        shape=s.signal_shape, pc=s.detector.pc_average,
        sample_tilt=s.detector.sample_tilt,
    )
    res_deg = float(os.environ.get("KP_EXAMPLE_RESOLUTION_DEG", "6.0"))
    rotations = sample_fundamental_zone(res_deg, "m-3m")
    dictionary = mp.get_patterns(rotations, det, dtype_out=np.float32)

    scores, indices = sharded_dictionary_index(
        s.data, dictionary.data, keep_n=5, mesh=mesh
    )
    print("top-1 indices:", indices[:, 0])
    print("top-1 scores:", np.round(scores[:, 0], 3))


if __name__ == "__main__":
    main()
