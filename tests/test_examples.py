"""Execute the shipped examples as smoke tests (VERDICT r3 item 9).

The reference re-executes its tutorial notebooks weekly
(``/root/reference/.github/workflows/weekly.yml``) so documentation
cannot rot; here each ``examples/*.py`` runs as a subprocess on the CPU
backend with a coarsened dictionary (``KP_EXAMPLE_RESOLUTION_DEG``) so
the full workflows stay test-suite-fast.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = sorted(
    (Path(__file__).resolve().parents[1] / "examples").glob("*.py")
)


@pytest.mark.parametrize("example", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(example, tmp_path):
    env = os.environ.copy()
    env.update(
        JAX_PLATFORMS="cpu",
        KP_EXAMPLE_RESOLUTION_DEG="10.0",
        MPLBACKEND="Agg",
    )
    # Examples insert their repo root into sys.path themselves.
    proc = subprocess.run(
        [sys.executable, str(example)],
        env=env,
        cwd=tmp_path,  # PNG/ang outputs land in the tmp dir
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"{example.name} failed:\n{proc.stdout}\n{proc.stderr}"
    )
