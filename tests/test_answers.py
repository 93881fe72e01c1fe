"""Stored-answer regression tests (rtol 1e-6, the reference's example
answer-test tolerance, grackle: src/python/tests/test_examples.py:103)."""

import os

import numpy as np
import pytest

from . import answer_workloads as aw

pytestmark = pytest.mark.skipif(
    not os.path.exists(aw.ANSWER_DIR),
    reason="no stored answers (run tests/answer_workloads.py regenerate)",
)


# rate tables use the reference's tighter rate-regression tolerance
# (grackle: src/python/tests/test_initialisation.py, rtol 1e-7)
_RTOL = {"rate_tables": 1e-7}


@pytest.mark.parametrize("name", sorted(aw.WORKLOADS))
def test_answer(name):
    path = os.path.join(aw.ANSWER_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"no stored answer for {name}")
    stored = np.load(path)
    current = aw.WORKLOADS[name]()
    for key in stored.files:
        np.testing.assert_allclose(
            np.asarray(current[key]), stored[key],
            rtol=_RTOL.get(name, 1e-6),
            err_msg=f"{name}/{key}",
        )
