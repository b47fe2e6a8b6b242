"""Pure step->value schedules.

The reference precomputes per-iteration numpy arrays
(``/root/reference/utils.py:161-173`` cosine_scheduler with linear warmup, and
the per-epoch teacher-temperature ramp at ``/root/reference/main_esvit.py:614-618``).
Here the same values are computed on the fly inside the jitted train step —
no host arrays, no dynamic indexing.

All functions take a (traced) step/epoch and static python floats/ints, and
return a jnp scalar, so they can live inside ``jit``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def cosine_schedule(step, *, base_value: float, final_value: float,
                    total_steps: int, warmup_steps: int = 0,
                    start_warmup_value: float = 0.0):
    """Linear warmup then half-cosine decay; matches utils.py:161-173 exactly.

    The reference builds ``np.linspace(start, base, warmup_iters)`` — i.e. the
    warmup phase hits ``base_value`` only at the *last* warmup iteration — and
    then ``final + 0.5*(base-final)*(1+cos(pi*i/n))`` for
    ``i in [0, n)`` with ``n = total - warmup``.
    """
    step = jnp.asarray(step, jnp.float32)
    n = max(total_steps - warmup_steps, 1)
    if warmup_steps > 0:
        # np.linspace(a, b, N)[i] == a + (b - a) * i / (N - 1)
        denom = max(warmup_steps - 1, 1)
        warm = start_warmup_value + (base_value - start_warmup_value) * step / denom
    else:
        warm = jnp.float32(base_value)
    i = step - warmup_steps
    cos = final_value + 0.5 * (base_value - final_value) * (1.0 + jnp.cos(jnp.pi * i / n))
    return jnp.where(step < warmup_steps, warm, cos).astype(jnp.float32)


def teacher_temp_schedule(epoch, *, warmup_teacher_temp: float, teacher_temp: float,
                          warmup_teacher_temp_epochs: int):
    """Per-epoch linear ramp of the teacher temperature
    (main_esvit.py:614-618: np.linspace over warmup epochs, then constant)."""
    epoch = jnp.asarray(epoch, jnp.float32)
    denom = max(warmup_teacher_temp_epochs - 1, 1)
    ramp = warmup_teacher_temp + (teacher_temp - warmup_teacher_temp) * epoch / denom
    return jnp.where(epoch < warmup_teacher_temp_epochs, ramp,
                     jnp.float32(teacher_temp)).astype(jnp.float32)


def reference_cosine_array(base_value: float, final_value: float, epochs: int,
                           niter_per_ep: int, warmup_epochs: int = 0,
                           start_warmup_value: float = 0.0) -> np.ndarray:
    """Host-side array identical to the reference's cosine_scheduler output,
    used in tests to check cosine_schedule value-for-value."""
    warmup_iters = warmup_epochs * niter_per_ep
    sched = []
    if warmup_epochs > 0:
        sched.append(np.linspace(start_warmup_value, base_value, warmup_iters))
    n = epochs * niter_per_ep - warmup_iters
    i = np.arange(n)
    sched.append(final_value + 0.5 * (base_value - final_value) * (1 + np.cos(np.pi * i / n)))
    return np.concatenate(sched)
