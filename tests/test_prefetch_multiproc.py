"""Host prefetcher + multi-process eval sharding.

The multi-process test launches two REAL jax processes (CPU backend,
jax.distributed over localhost) that each evaluate their shard_indices()
slice of a fabricated mask set and all_reduce the IoUAccumulator — the
DistributedSampler + dist.all_reduce equivalent of
evaluation_walkgpt.py:393-401 / train_walkgpt.py:1259-1263. The reduced
totals must equal a single-process pass over the full set.
"""
import json
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from walkgpt_tpu.data.prefetch import prefetch, prefetch_map, shard_indices


def test_shard_indices_partition():
    n = 11
    shards = [shard_indices(n, process_index=i, process_count=3)
              for i in range(3)]
    flat = sorted(x for s in shards for x in s)
    assert flat == list(range(n))
    assert shards[0] == [0, 3, 6, 9]
    assert shard_indices(n, process_index=0, process_count=1) == list(range(n))


def test_prefetch_preserves_order():
    got = list(prefetch(iter(range(50)), depth=3))
    assert got == list(range(50))
    assert list(prefetch(iter([]), depth=2)) == []


def test_prefetch_map_overlaps():
    """Producer runs ahead: with depth 2 and a slow consumer, items are ready
    before the consumer asks."""
    log = []

    def load(i):
        log.append(("produce", i))
        return i

    it = prefetch_map(load, range(4), depth=2)
    first = next(it)
    time.sleep(0.05)                      # let the producer fill the queue
    assert first == 0
    assert ("produce", 2) in log          # ran ahead of consumption
    assert list(it) == [1, 2, 3]


def test_prefetch_propagates_exception():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


_WORKER = r"""
import json, os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
from walkgpt_tpu.data.prefetch import shard_indices
from walkgpt_tpu.eval.metrics import IoUAccumulator

n = 9
rng = np.random.RandomState(0)
masks = [((rng.rand(8, 8) > 0.5).astype(np.int64),
          (rng.rand(8, 8) > 0.5).astype(np.int64)) for _ in range(n)]
acc = IoUAccumulator()
for i in shard_indices(n):
    acc.add_mask(*masks[i])
acc.all_reduce()
print("RESULT " + json.dumps(acc.results()))
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_sharded_eval_totals_two_processes(tmp_path):
    coord = f"localhost:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_NUM_CPU_DEVICES"] = "1"
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        cwd="/root/repo") for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, err[-2000:]
        outs.append(out)

    # single-process truth over the full set
    from walkgpt_tpu.eval.metrics import IoUAccumulator
    rng = np.random.RandomState(0)
    masks = [((rng.rand(8, 8) > 0.5).astype(np.int64),
              (rng.rand(8, 8) > 0.5).astype(np.int64)) for _ in range(9)]
    acc = IoUAccumulator()
    for pred, gt in masks:
        acc.add_mask(pred, gt)
    want = acc.results()

    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
        got = json.loads(line[len("RESULT "):])
        assert got["n_masks"] == 9.0
        for k, v in want.items():
            if v != v:
                assert got[k] != got[k], k
            else:
                np.testing.assert_allclose(got[k], v, rtol=1e-12, err_msg=k)
