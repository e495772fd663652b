"""Trace-time kernel-dispatch control.

Pallas-vs-composed dispatch normally keys on backend + shapes + the
``GEOA3_DISABLE_PALLAS`` env kill switch. That is fine for compute whose
numerics are certified end-to-end, but NOT for accuracy judgments whose
results feed *selection* decisions: the best-checkpoint rule (reference
main_train.py:311-339) and the attack-set distillation filter (reference
Provider/gen_data_mat.py:250-263). In round 3 an eval-accuracy ULP
difference from a fused kernel picked a different (equally 100%-accurate)
best victim draw, which silently changed the certified attack headline —
a reproducibility wart, not a numerics bug.

``pinned_composed()`` forces every kernel gate to report unavailable while
the context is active. Because jit tracing executes the Python body, a
``with pinned_composed():`` *inside* the jitted function pins the dispatch
decisions baked into that program, no matter when or how often it is traced,
without leaking to any other program in the process (the compiled
executable has no trace of the context manager).
"""

from __future__ import annotations

import contextlib
import os
import threading

_state = threading.local()


def forced_composed() -> bool:
    """True while inside a ``pinned_composed()`` context (this thread)."""
    return getattr(_state, "pin", 0) > 0


@contextlib.contextmanager
def pinned_composed():
    """Force the composed (pure-XLA) path for every op gated below."""
    _state.pin = getattr(_state, "pin", 0) + 1
    try:
        yield
    finally:
        _state.pin -= 1


def pallas_disabled(which: str) -> bool:
    """Single chokepoint for every Pallas-kernel gate.

    True if the kernel named ``which`` must not be used: either dispatch is
    pinned to the composed path (see module docstring) or the
    ``GEOA3_DISABLE_PALLAS`` kill switch names it (or ``all``).
    """
    if forced_composed():
        return True
    flags = os.environ.get("GEOA3_DISABLE_PALLAS", "")
    return "all" in flags or which in flags
