"""Protect the driver hooks: the multi-chip dryrun must keep compiling and
running on a small virtual-device mesh (the full 8-device variant is run by
the driver; 2 devices keeps this suite-friendly on the 1-core sandbox)."""

import sys
import os

import pytest

pytestmark = pytest.mark.heavy  # multi-minute full-tower CPU compiles


def test_dryrun_multichip_two_devices():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    g.dryrun_multichip(2)
