"""Multi-chip dry run on the virtual 8-device CPU mesh + graft entry."""

import jax
import numpy as np


def test_dryrun_multichip():
    assert len(jax.devices()) >= 8
    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_entry_jits():
    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn)(*[jax.numpy.asarray(a) for a in args])
    ll = np.asarray(out[0])
    assert np.isfinite(ll).all()
