"""Golden regression: the fp64 leapfrog bootstrap (initialize ->
first_step, full physics) reproduces stored reference values bit-tightly.

This is the TPU build's replacement for the reference's deterministic
output-diff workflow (SURVEY section 4): any unintended numerics change in
the transform core, dynamics, or physics shifts these values. Regenerate
goldens deliberately with tests/data/README when a change is intentional.
"""
import os

import numpy as np
import pytest

from speedy_tpu.config import t30
from speedy_tpu.models.model import Model
from speedy_tpu.utils.calendar import Datetime
from speedy_tpu.utils.diagnostics import compute_diagnostics

GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "golden_boot_fp64.npz")


@pytest.mark.slow
def test_bootstrap_matches_golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden file missing")
    gold = np.load(GOLDEN)
    m = Model(t30(precision="fp64"))
    state = m.initialize(Datetime(1982, 1, 1))
    d = compute_diagnostics(m.mc.dyn.sc, state.prog.vor[1],
                            state.prog.div[1], state.prog.t[1])
    np.testing.assert_allclose(np.asarray(d.reke), gold["reke"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(d.deke), gold["deke"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(d.tmean), gold["tmean"],
                               rtol=1e-13)
    np.testing.assert_allclose(np.asarray(state.prog.vor), gold["vor"],
                               atol=1e-18)
    np.testing.assert_allclose(np.asarray(state.prog.ps), gold["ps"],
                               atol=1e-15)
