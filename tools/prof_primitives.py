"""Microbenchmarks for the counting-path primitives on this chip:
H2D transfer (tunneled!), lax.sort at various sizes/operand counts,
the merge-path kernel, build_packed device time, finalize.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from soapdenovo_trans_tpu.ops import dictionary
from soapdenovo_trans_tpu.kernels import merge_path

K = 23


def sync(out):
    """block_until_ready is unreliable through the axon tunnel (returns
    before execution); a 1-element readback is a true sync."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[:1] if getattr(leaf, "ndim", 0) else leaf)


def bench(fn, *args, reps=3, warm=1):
    for _ in range(warm):
        sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    print(f"backend: {jax.default_backend()}")

    # H2D bandwidth
    for mb in (5, 20, 80):
        x = np.random.randint(0, 4, size=(mb * 1024 * 1024,), dtype=np.uint8)
        t = bench(lambda a: jax.device_put(a), x)
        print(f"H2D {mb}MB u8: {t*1e3:.1f} ms  ({mb/t:.0f} MB/s)")

    # sort throughput: rows x lanes
    for n_m in (4, 16, 32, 64):
        n = n_m * 1024 * 1024
        a = jnp.asarray(np.random.randint(0, 2**31, size=n, dtype=np.int32))
        b = jnp.asarray(np.random.randint(0, 2**31, size=n, dtype=np.int32))
        c = jnp.asarray(np.random.randint(0, 2**31, size=n, dtype=np.int32))
        f2 = jax.jit(lambda x, y: jax.lax.sort((x, y), num_keys=2))
        f3 = jax.jit(lambda x, y, z: jax.lax.sort((x, y, z), num_keys=2))
        f1p = jax.jit(lambda x, y, z: jax.lax.sort((x, y, z), num_keys=1))
        t2 = bench(f2, a, b)
        t3 = bench(f3, a, b, c)
        t1 = bench(f1p, a, b, c)
        print(f"sort {n_m}M rows: 2op(2key) {t2*1e3:.0f} ms "
              f"({n/t2/1e6:.0f} Mrows/s)  3op(2key) {t3*1e3:.0f} ms  "
              f"3op(1key) {t1*1e3:.0f} ms", flush=True)

    # merge kernel at sizes
    for n_m in (8, 16, 32):
        n = n_m * 1024 * 1024
        rows = np.zeros((n, 2), np.uint32)
        rows[:, 0] = np.sort(
            np.random.randint(0, 2**31, size=n, dtype=np.int64)).astype(
                np.uint32)
        ar = jnp.asarray(rows)
        cnt = jnp.ones(n, jnp.int32)
        nn = jnp.int32(n)

        def mk(a_, c_, n_):
            return merge_path.merge_sorted_rows(a_, c_, a_, c_, n_, n_)

        t = bench(mk, ar, cnt, nn)
        print(f"merge kernel {n_m}M+{n_m}M: {t*1e3:.0f} ms "
              f"({2*n/t/1e6:.0f} Mrows/s)", flush=True)

    # build_packed_from_reads device time (sync included), reads on device
    for n_reads in (200_000, 400_000, 800_000):
        codes = np.random.randint(0, 4, size=(n_reads, 100), dtype=np.uint8)
        lens = np.full(n_reads, 100, np.int32)
        dc = jax.device_put(codes)
        dl = jax.device_put(lens)

        def build(c, l):
            return dictionary._build_from_reads_device(c, l, K)

        t = bench(build, dc, dl)
        rows = n_reads * 78
        print(f"build {n_reads} reads ({rows/1e6:.1f}M rows): "
              f"{t*1e3:.0f} ms ({rows/t/1e6:.0f} Mrows/s)", flush=True)


if __name__ == "__main__":
    main()
