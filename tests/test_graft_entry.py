"""Driver-contract regression: entry() is jittable; dryrun_multichip runs
its three multichip programs on a small virtual mesh."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (256, 5)
    np.testing.assert_allclose(out.sum(1), np.ones(256), rtol=1e-3)


def test_dryrun_multichip_two_devices(capfd):
    # capfd (fd-level): the dryrun self-forces its platform in a SUBPROCESS
    # (the driver-contract fix), so python-level capsys sees nothing
    import __graft_entry__ as g

    g.dryrun_multichip(2)
    out = capfd.readouterr().out
    assert "classifier-dp" in out
    assert "yolo-dp" in out
    assert "spatial-halo-conv" in out
