"""REAL multi-host training smoke: 2 jax processes x 4 virtual CPU devices
form one 8-device global mesh (dp=2 x tp=4) and run ONE sharded train step.
This exercises the process_count>1 code paths (global mesh construction,
cross-process device_put of replicated inputs, XLA collectives over the
distributed runtime) that single-process tests cannot reach.

Both ranks must report the identical finite loss, and it must match the
single-process 8-device dryrun (same tiny config, same seeds).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
assert jax.process_count() == 2
assert len(jax.devices()) == 8, len(jax.devices())

import numpy as np
import __graft_entry__ as ge
from walkgpt_tpu.core.config import tiny_config
from walkgpt_tpu.data.tokenizer import ByteTokenizer, setup_walkgpt_tokens
from walkgpt_tpu.models import walkgpt
from walkgpt_tpu.parallel import sharding as shd
from walkgpt_tpu.runtime import train as tr

tok = ByteTokenizer(model_max_length=2048)
st = setup_walkgpt_tokens(tok)
cfg = tiny_config(seg_token_id=st.seg_token_idx)
params = walkgpt.init(jax.random.PRNGKey(0), cfg)
batch, max_segs = ge._make_inputs(cfg, tok, st, n_images=2, seq_multiple=32)

mesh = shd.make_mesh(dp=2, tp=4)
tcfg = tr.TrainConfig(warmup_steps=1, total_steps=10)
state, opt = tr.init_state(params, tcfg)
step_fn, sstate, _ = tr.make_sharded_train_step(mesh, opt, cfg, max_segs,
                                                state, batch)
new_state, metrics = step_fn(sstate, batch)
loss = float(metrics["loss"])
assert int(new_state.step) == 1
print(f"RANK{jax.process_index()} LOSS {loss:.6f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_train_step(tmp_path):
    coord = f"localhost:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        cwd="/root/repo") for i in range(2)]
    losses = {}
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, err[-3000:]
        line = [l for l in out.splitlines() if "LOSS" in l][0]
        rank, _, loss = line.split()
        losses[rank] = float(loss)
    assert set(losses) == {"RANK0", "RANK1"}
    vals = list(losses.values())
    assert np.isfinite(vals[0])
    # both ranks computed the same global loss
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-6)
    # and it matches the single-process 8-device dryrun (loss=1.7990 with
    # these seeds — keep loose to survive numeric/library drift)
    assert abs(vals[0] - 1.7990) < 0.05, vals[0]
