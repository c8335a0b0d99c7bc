"""Elastic checkpoint/resume across device counts (VERDICT r4 #5).

The reference's DDP checkpoints are world-size-portable by construction
(yolov3/train.py:352-356 saves the unwrapped module's state_dict). The
Orbax+GSPMD stack must keep that property: a TrainState saved from an
N-way mesh restores onto any other mesh width and the loss trajectory
continues identically. The driver-run `dryrun_multichip` exercises the
8->4->1 ladder (__graft_entry__._dryrun_elastic); this test pins the
same property hermetically on 2->1 so a regression fails in CI, not
only at driver time.
"""

import sys

import jax
import pytest

sys.path.insert(0, "/root/repo")


def test_elastic_resume_2_to_1_devices():
    import __graft_entry__ as ge

    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs >=2 virtual devices (conftest forces 8)")
    # ladder inside: [2, 1, 1] -> unique [2, 1]; asserts trajectories
    # match across widths and continue below the pre-save loss
    ge._dryrun_elastic(devices[:2], 2)
