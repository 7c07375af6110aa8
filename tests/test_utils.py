"""Utility module tests: meters, bargraph, phase timers."""
import time

import numpy as np

from frtm_tpu.utils.meters import AverageMeter, text_bargraph
from frtm_tpu.utils.profiling import PhaseTimer


def test_average_meter_ignores_nan():
    m = AverageMeter()
    m.update(1.0)
    m.update(float("nan"))
    m.update(3.0)
    assert m.avg == 2.0 and m.count == 2
    m.update_multi([1.0, float("nan"), 5.0])
    assert m.count == 4


def test_text_bargraph():
    g = text_bargraph([0.0, 0.5, 1.0, float("nan"), -0.5, 1.5])
    assert len(g) == 6
    assert g[3] == "░"   # NaN marker
    assert g[4] == "u"   # below range
    assert g[5] == "o"   # above range
    assert g[2] == "█"   # full


def test_phase_timer():
    t = PhaseTimer(sync=False)
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert t.totals["a"] >= 0.01
    rep = t.report()
    assert "a:" in rep and "x2" in rep
    t.reset()
    assert not t.totals
