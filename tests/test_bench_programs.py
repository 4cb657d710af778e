"""CPU unit tests for bench.py's device programs and status plumbing
(the driver-facing benchmark must not rot between TPU sessions)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


@pytest.fixture()
def small_bench(monkeypatch):
    """Shrink the benchmark configuration for CPU execution."""
    monkeypatch.setattr(bench, "N", 64)
    monkeypatch.setattr(bench, "M", 512)
    monkeypatch.setattr(bench, "D", 3600)
    monkeypatch.setattr(bench, "N_GATE", 16)
    monkeypatch.setattr(bench, "TILE", 512)
    monkeypatch.setattr(bench, "REPS_DEVICE", 3)
    return bench


class TestPrograms:
    def test_planted_matches_win_and_score_exact(self, small_bench):
        _, gate, _, combined = small_bench._def_programs()
        acc, s, i, e_g, d_g = combined(np.int32(0))
        planted = small_bench._planted_indices()
        e_g, d_g = np.asarray(e_g), np.asarray(d_g)
        assert e_g.shape == d_g.shape == (16, small_bench.D)
        assert (np.asarray(i)[:16, 0] == planted).all()
        host = np.einsum("ij,ij->i", e_g, d_g)
        # f16 materialization bounds the rounding at 2.44e-4.
        assert np.abs(host - np.asarray(s)[:16, 0]).max() < 1e-3
        assert np.isfinite(float(np.asarray(acc)))
        # Exact gate regenerates the operands from the seed: its gate
        # rows must be bit-close to the combined program's slices, its
        # winners exact, its scores tighter than the f16 tier's.
        sg, ig, eg2, dg2 = (np.asarray(x) for x in gate(np.int32(0)))
        assert np.abs(eg2 - e_g).max() < 1e-6
        assert np.abs(dg2 - d_g).max() < 1e-6
        assert (ig[:, 0] == planted).all()
        assert np.abs(host - sg[:, 0]).max() < 1e-5

    def test_operands_prepared_and_decorrelated(self, small_bench):
        gen, *_ = small_bench._def_programs()
        e, d = (np.asarray(x) for x in gen(np.int32(3)))
        # NCC preparation: zero-mean, unit-norm rows.
        assert np.abs(e.mean(axis=1)).max() < 1e-6
        assert np.abs(np.linalg.norm(e, axis=1) - 1).max() < 1e-5
        assert np.abs(np.linalg.norm(d, axis=1) - 1).max() < 1e-5
        # Counter streams are disjoint: non-planted cross-correlations
        # sit at the random-noise level (~4.5/sqrt(D) max), nowhere
        # near the planted ~0.82 (a shifted-copy overlap bug once put
        # phantom 0.5+ correlations here).
        planted = small_bench._planted_indices()
        cross = e @ d.T
        cross[np.arange(16), planted] = 0
        assert np.abs(cross).max() < 0.15

    def test_seed_changes_operands(self, small_bench):
        gen, *_ = small_bench._def_programs()
        e0, _ = gen(np.int32(0))
        e1, _ = gen(np.int32(1))
        assert not np.allclose(np.asarray(e0), np.asarray(e1))

    def test_combined_passes_not_collapsed(self, small_bench):
        """The checksum must consume every chained pass (guards the
        CSE/dead-code defenses): acc equals REPS_DEVICE times the
        (essentially identical) per-pass top score at [0, 0]."""
        _, _, _, combined = small_bench._def_programs()
        acc, s, *_ = combined(np.int32(0))
        per_pass = float(np.asarray(s)[0, 0])
        total = float(np.asarray(acc))
        assert abs(total - small_bench.REPS_DEVICE * per_pass) < 1e-2


@pytest.fixture()
def tiny_secondary(monkeypatch):
    """Shrink the secondary-stage configuration for CPU execution."""
    monkeypatch.setattr(bench, "N_REF", 18)
    monkeypatch.setattr(bench, "SH_L", 48)
    monkeypatch.setattr(bench, "REFINE_ITERS", 6)
    monkeypatch.setattr(bench, "N_PRE", 8)
    monkeypatch.setattr(bench, "REPS_PRE", 2)
    return bench


@pytest.mark.slow
class TestSecondaryPrograms:
    def test_preprocess_matches_oracle(self, tiny_secondary):
        import jax.numpy as jnp

        from kikuchipy_tpu.ops import pattern as _ops

        pre = tiny_secondary._def_preprocess_program()
        acc, raw8, out8, bg = (np.asarray(x) for x in pre(np.int32(1)))
        assert raw8.dtype == np.uint8 and out8.dtype == np.uint8
        expect = np.asarray(
            _ops.remove_dynamic_background(
                _ops.remove_static_background(
                    jnp.asarray(raw8), jnp.asarray(bg)
                )
            )
        )
        assert np.abs(expect.astype(int) - out8.astype(int)).max() <= 1
        assert np.isfinite(float(acc))

    def test_refine_program_improves_orientations(self, tiny_secondary):
        refine = tiny_secondary._def_refine_program()
        inputs = tiny_secondary._refine_inputs()
        acc, q_ref = refine(*inputs)
        assert np.isfinite(float(np.asarray(acc)))
        base9, truth9 = inputs[0], inputs[1]
        n = tiny_secondary.N_REF
        truth = np.tile(truth9, (-(-n // 9), 1))[:n]
        from kikuchipy_tpu.crystallography.sampling import (
            disorientation_angle,
        )

        ang = np.degrees(
            np.asarray(disorientation_angle(truth, np.asarray(q_ref), "m-3m"))
        )
        # 2-degree perturbed starts must move toward truth even at the
        # reduced L used on CPU (L=48 -> mean ~0.8 deg measured; the
        # production L=80 <0.8 deg MAX criterion is gated at bench time
        # on hardware).
        assert ang.mean() < tiny_secondary.PERTURB_DEG * 0.55, ang.mean()


class TestProgramHash:
    def test_stable_and_hexlike(self):
        h1, h2 = bench._program_hash(), bench._program_hash()
        assert h1 == h2
        int(h1, 16)
        assert len(h1) == 32

    def test_metadata_includes_hash_and_shape(self):
        meta = json.loads(json.dumps({"programs": bench._program_hash()}))
        assert meta["programs"] == bench._program_hash()


class TestStatus:
    def test_durable_write_and_clear(self, tmp_path):
        st = bench._Status(tmp_path / "s.json")
        st.write()  # pps == 0 -> no file
        assert not st.path.exists()
        st.state.update(pps=123.0, vs_baseline=4.5, config="precision=f16")
        st.write()
        line = json.loads(st.path.read_text())
        assert line["value"] == 123.0
        assert line["unit"] == "patterns/s"
        assert "precision=f16" in line["metric"]
        st.state.update(refine_pps=678.0)
        st.write()
        assert "refinement 678" in json.loads(st.path.read_text())["metric"]
        st.clear()
        assert not st.path.exists()
