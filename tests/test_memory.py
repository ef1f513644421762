"""utils.memory: host-heap trim (the long-session RSS-creep fix)."""

import numpy as np

from ndt_2d_tpu.utils import memory


def test_trim_host_heap_idempotent():
    # Callable repeatedly, never raises; on glibc/Linux it returns a bool.
    r1 = memory.trim_host_heap()
    r2 = memory.trim_host_heap()
    assert isinstance(r1, bool) and isinstance(r2, bool)


def test_trim_reclaims_after_large_churn():
    import sys
    if not sys.platform.startswith("linux"):
        return

    def rss_kb():
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1])

    # Churn ~256 MB of short-lived buffers, then trim: RSS should drop
    # back within 64 MB of the pre-churn level (the exact reclaim depends
    # on arena layout, so the bound is loose).
    memory.trim_host_heap()
    base = rss_kb()
    for _ in range(8):
        _ = [np.zeros(4 << 20) for _ in range(1)]  # 32 MB each, freed
    memory.trim_host_heap()
    after = rss_kb()
    assert after - base < 64 * 1024
