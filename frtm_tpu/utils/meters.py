"""Console metering utilities (capability of /root/reference/lib/utils.py:9-22,
66-94): running averages and the unicode bargraph used in evaluation reports."""
import numpy as np


class AverageMeter:
    """Running average that ignores NaN updates."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        if not np.isnan(val):
            self.val = val
            self.sum += val * n
            self.count += n
            self.avg = self.sum / self.count

    def update_multi(self, vals):
        vals = np.asarray(vals, dtype=np.float64)
        v = vals[~np.isnan(vals)]
        self.val = vals
        self.sum += v.sum()
        self.count += len(v)
        if self.count:
            self.avg = self.sum / self.count


def text_bargraph(values):
    """Unicode sparkline of values in [0, 1]; NaN renders as a shaded block,
    out-of-range as 'u'/'o' markers."""
    blocks = np.array(("u", " ", "▁", "▂", "▃", "▄", "▅", "▆", "▇", "█", "o"))
    nsteps = len(blocks) - 2 - 1
    hstep = 1 / (2 * nsteps)
    values = np.array(values, dtype=np.float64)
    nans = np.isnan(values)
    values[nans] = 0
    indices = ((values + hstep) * nsteps + 1).astype(int)
    indices[values < 0] = 0
    indices[values > 1] = len(blocks) - 1
    graph = blocks[indices]
    graph[nans] = "░"
    return "".join(graph)
