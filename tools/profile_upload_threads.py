"""Can two upload threads beat the ~44 MB/s relay upload floor?

The fused-e2e device path is pinned at ~35 s for 1.5 GB of decoded tiles
(ROUND5.md item 6): host→device upload through the relay is CPU-bound
serialization + wire wait, and the r5 chunk-size A/B showed the floor is
the upload path itself, not dispatch granularity. Hypothesis (same shape
as the decode-prefetch win): the WIRE part of each chunk's upload is idle
CPU time, so a second thread can serialize chunk i+1 while chunk i is on
the wire — even on this 1-vCPU host.

Measures: upload TOTAL_MB of uint8 tile chunks with 1 / 2 / 3 threads
(each thread device_puts its own chunks; one final fence), 2 repeats.

Run: python tools/profile_upload_threads.py [total_mb] [chunk_tiles]
"""

import sys
import threading
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

TILE = 224 * 224 * 3  # bytes per decoded tile


def main():
    total_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    chunk_tiles = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    chunk_bytes = chunk_tiles * TILE
    n_chunks = max(1, int(total_mb * 1e6 / chunk_bytes))
    rng = np.random.default_rng(0)
    chunks = [
        rng.integers(0, 256, (chunk_tiles, 224, 224, 3), np.uint8)
        for _ in range(n_chunks)
    ]
    total_gb = n_chunks * chunk_bytes / 1e9
    print(f"{n_chunks} chunks x {chunk_tiles} tiles = {total_gb:.2f} GB",
          flush=True)

    # warm the dispatch path
    np.asarray(jnp.asarray(chunks[0][:8]).sum())

    for n_threads in (1, 2, 3):
        for rep in range(2):
            outs = [None] * n_chunks

            def worker(tid):
                for i in range(tid, n_chunks, n_threads):
                    outs[i] = jnp.asarray(chunks[i])

            t0 = time.perf_counter()
            threads = [threading.Thread(target=worker, args=(t,))
                       for t in range(n_threads)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            # fence: one scalar from every chunk (forces completion)
            s = sum(o[0, 0, 0, 0].astype(jnp.int32) for o in outs)
            int(np.asarray(s))
            dt = time.perf_counter() - t0
            print(f"threads={n_threads} rep={rep}: {dt:7.2f} s  "
                  f"{total_gb / dt * 1e3:6.1f} MB/s", flush=True)
            del outs


if __name__ == "__main__":
    main()
