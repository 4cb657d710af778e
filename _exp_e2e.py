"""BASELINE config-4 style end-to-end: 75k-pattern scan, 100k dictionary,
preprocess -> DI -> top-1 orientation refinement, wall-clock on chip."""
import time
import numpy as np
import jax, jax.numpy as jnp
import kikuchipy_tpu as kp
from kikuchipy_tpu.crystallography.sampling import sample_fundamental_zone, disorientation_angle
from kikuchipy_tpu.filters.window import Window
from kikuchipy_tpu.geometry import quaternion as Q

s9 = kp.load("/root/reference/src/kikuchipy/data/kikuchipy_h5ebsd/patterns.h5")
N = 75_000
reps = N // 9 + 1
raw = np.tile(np.asarray(s9.data).reshape(9, 60, 60), (reps, 1, 1))[:N]
det = kp.detectors.EBSDDetector(shape=(60, 60), pc=s9.detector.pc_average, sample_tilt=70)
sig = kp.signals.EBSD(data=raw, detector=det, static_background=s9.static_background)
mp = kp.load("/root/reference/src/kikuchipy/data/emsoft_ebsd_master_pattern/ni_mc_mp_20kv_uint8_gzip_opts9.h5",
             projection="lambert", hemisphere="both")

t0 = time.perf_counter()
rot = sample_fundamental_zone(3.0, "m-3m")
print(f"sampling: {rot.shape[0]} orientations in {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
pre = sig.remove_static_background().remove_dynamic_background()
np.asarray(pre.data[:1])
t_pre = time.perf_counter() - t0
print(f"preprocess {N} patterns: {t_pre:.1f}s ({N*3600/t_pre/1e6:.0f} MB/s)", flush=True)

t0 = time.perf_counter()
dic = mp.get_patterns(rot, det, dtype_out=np.float32)
np.asarray(dic.data[:1])
t_dict = time.perf_counter() - t0
M = rot.shape[0]
print(f"dictionary {M} patterns: {t_dict:.1f}s ({M/t_dict:.0f} pps)", flush=True)

mask = ~np.asarray(Window("circular", shape=(60, 60)), dtype=bool)
t0 = time.perf_counter()
xmap = pre.dictionary_indexing(dic, keep_n=10, signal_mask=mask, precision="default")
t_di = time.perf_counter() - t0
print(f"DI {N}x{M}: {t_di:.1f}s ({N/t_di:.0f} pps)", flush=True)

t0 = time.perf_counter()
res = pre.refine_orientation(xmap=xmap, detector=det, master_pattern=mp, energy=20,
                             signal_mask=mask, method="nm")
t_ref = time.perf_counter() - t0
print(f"refinement: {t_ref:.1f}s ({N/t_ref:.0f} pps)", flush=True)
total = t_pre + t_dict + t_di + t_ref
print(f"TOTAL pipeline: {total:.1f}s ({N/total:.0f} patterns/s end-to-end)", flush=True)

# sanity: recovered orientations close to stored ones
import h5py
with h5py.File("/root/reference/src/kikuchipy/data/kikuchipy_h5ebsd/patterns.h5") as f:
    g = f["Scan 1/EBSD/CrystalMap/crystal_map/data"]
    eul = np.stack([g["phi1"][:], g["Phi"][:], g["phi2"][:]], -1)
q_true = np.tile(np.asarray(Q.from_euler(eul)), (reps, 1))[:N]
qr = np.asarray(res.xmap.rotations)
err = np.rad2deg(disorientation_angle(q_true[:99], qr[:99], "m-3m"))
print(f"refined misorientation vs stored (first 99): max {err.max():.2f} deg")
