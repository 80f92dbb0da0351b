import pytest
"""Driver entry points stay healthy: single-chip compile + multichip dryrun."""
import sys
from pathlib import Path

import jax

pytestmark = pytest.mark.slow  # heavy: excluded from the fast core (make test-fast)

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_entry_compiles():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 192)


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_dryrun_multichip_2():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(2)
