"""Measure the host<->device link: per-transfer floor, bandwidth, RTTs.

The numbers this prints are the physics behind the online-serving design
(docs/performance.md "Online serving"): on a tunnel-attached TPU every
host->device transfer pays a fixed protocol floor and transfers serialize,
so the server ships ONE packed buffer per frame (or per stream_chunk
frames).  Run it whenever serving throughput looks off — the bench embeds
a 2-point version of this probe in its online_latency details, but this
standalone sweep shows the full size curve and whether transfers overlap.

Usage: python tools/link_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}")

    # H2D: per-transfer floor vs size
    for nbytes in (64, 4096, 65536, 262144, 1048576, 4194304):
        arr = np.zeros(max(nbytes // 4, 1), np.float32)
        jax.device_put(arr).block_until_ready()
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            jax.device_put(arr).block_until_ready()
            ts.append(time.perf_counter() - t0)
        m = min(ts)
        print(f"H2D {nbytes / 1024:8.0f} KiB: min {m * 1e3:7.2f} ms  "
              f"bw {arr.nbytes / m / 1e6:8.1f} MB/s")

    # do N mid-size transfers overlap?  (serialized links show ~N x floor)
    bufs = [np.zeros(1 << 16, np.float32) for _ in range(6)]
    for b in bufs:
        jax.device_put(b).block_until_ready()
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        ys = [jax.device_put(b) for b in bufs]
        for y in ys:
            y.block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"6 x 256 KiB concurrent: min {min(ts) * 1e3:.1f} ms "
          f"(serialized links: ~6 x the single-transfer time)")

    # jit dispatch: sync round trip vs async enqueue
    f = jax.jit(lambda a: a + 1)
    z = jax.device_put(jnp.zeros(128, jnp.float32))
    f(z).block_until_ready()
    ts = []
    for _ in range(15):
        t0 = time.perf_counter()
        f(z).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"jit dispatch+sync RTT: min {min(ts) * 1e3:.2f} ms")
    y = z
    t0 = time.perf_counter()
    for _ in range(100):
        y = f(y)
    t1 = time.perf_counter()
    y.block_until_ready()
    t2 = time.perf_counter()
    print(f"async enqueue: {(t1 - t0) / 100 * 1e3:.3f} ms/call; "
          f"100-dispatch chain drains in {(t2 - t0) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
