"""Driver-contract tests: __graft_entry__.entry() must stay jittable and
dryrun_multichip must compile+run the dp×tp train step on a virtual mesh —
the same checks the round driver performs."""

import jax
import pytest


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh from conftest")
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts finite loss internally


def test_entry_abstract_eval():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape[0] == 2 and out.shape[-1] == 50267
