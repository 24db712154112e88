"""Golden-tensor regression tests. Regenerate deliberately via
`python tests/golden_utils.py regen` after intentional numerics changes."""

import os

import numpy as np
import pytest

from tests.golden_utils import BUILDERS, GOLDEN_DIR


@pytest.mark.parametrize(
    "name",
    [pytest.param(n, marks=pytest.mark.slow) if n == "guided_e2e" else n
     for n in sorted(BUILDERS)],
)
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated")
    stored = np.load(path)
    current = BUILDERS[name]()
    assert set(stored.files) == set(current)
    for key in stored.files:
        np.testing.assert_allclose(
            np.asarray(current[key]), stored[key], rtol=2e-4, atol=2e-5,
            err_msg=f"{name}/{key} drifted from golden",
        )
