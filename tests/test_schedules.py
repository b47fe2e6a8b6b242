"""cosine_schedule must reproduce the reference's precomputed arrays
(utils.py:161-173) value-for-value."""

import jax.numpy as jnp
import numpy as np
import pytest

from esvit_tpu.utils import schedules


@pytest.mark.parametrize("base,final,epochs,niter,warmup,start", [
    (5e-4, 1e-6, 300, 10, 10, 0.0),     # LR schedule shape
    (0.04, 0.4, 300, 10, 0, 0.0),       # WD schedule
    (0.996, 1.0, 100, 7, 0, 0.0),       # teacher momentum
    (1e-3, 1e-5, 20, 13, 3, 1e-6),      # warm start value
])
def test_matches_reference_array(base, final, epochs, niter, warmup, start):
    ref = schedules.reference_cosine_array(base, final, epochs, niter, warmup, start)
    steps = np.arange(epochs * niter)
    ours = np.array([
        schedules.cosine_schedule(s, base_value=base, final_value=final,
                                  total_steps=epochs * niter,
                                  warmup_steps=warmup * niter,
                                  start_warmup_value=start)
        for s in steps[:: max(1, len(steps) // 97)]])
    sub = ref[:: max(1, len(steps) // 97)]
    np.testing.assert_allclose(ours, sub, rtol=1e-5, atol=1e-7)


def test_teacher_temp_matches_reference():
    warmup, final, init = 30, 0.07, 0.04
    ref = np.concatenate([np.linspace(init, final, warmup),
                          np.ones(300 - warmup) * final])
    ours = np.array([
        schedules.teacher_temp_schedule(e, warmup_teacher_temp=init,
                                        teacher_temp=final,
                                        warmup_teacher_temp_epochs=warmup)
        for e in range(300)])
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
