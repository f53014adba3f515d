"""Capture per-HLO device times for a flagship train step: the xprof
accounting method behind benchmarks/NOTES.md's per-round breakdowns.

Run from the repo root:
    python benchmarks/trace_step.py [dtype]        # detection (B=128)
    python benchmarks/trace_step.py [dtype] ssl    # SSL enc-dec (B=128)
"""
import glob, os, sys, time
import numpy as np

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _root not in sys.path:
    sys.path.insert(0, _root)

from eeg_gnn_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp

from eeg_gnn_tpu.config import ExperimentConfig
from eeg_gnn_tpu.graphs import compute_supports_jnp
from eeg_gnn_tpu.models.registry import build_model
from eeg_gnn_tpu.train.optim import make_optimizer
from eeg_gnn_tpu.train.step import make_train_step, supervised_loss_fn

b, t = 128, 60
dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
task_ssl = len(sys.argv) > 2 and sys.argv[2] == "ssl"
rng = np.random.RandomState(0)
key = jax.random.PRNGKey(0)
optimizer = make_optimizer(1e-4, 5e-4, 5.0, 100, 100)
if task_ssl:
    from eeg_gnn_tpu.models.dcrnn import init_next_time_pred_model
    from eeg_gnn_tpu.train.step import ssl_loss_fn

    cfg = ExperimentConfig(do_train=True, task="SS pre-training",
                           graph_type="combined", num_rnn_layers=3,
                           max_seq_len=t, output_seq_len=12,
                           use_curriculum_learning=True,
                           dtype=dtype).finalize()
    params = init_next_time_pred_model(jax.random.PRNGKey(0),
                                       cfg.dcrnn_config())
    mstate = {}
    opt_state = optimizer.init(params)
    base_step = make_train_step(
        ssl_loss_fn(cfg.dcrnn_config(), jnp.float32(0.0),
                    jnp.float32(1.0)),
        optimizer, donate=False, has_batches_seen=True)
    sup = compute_supports_jnp(
        jnp.asarray(np.abs(rng.rand(b, 19, 19)), np.float32), "laplacian")
    batch = {"x": jnp.asarray(rng.randn(b, t, 19, 100), jnp.float32),
             "y": jnp.asarray(rng.randn(b, 12, 19, 100), jnp.float32),
             "supports": sup}

    def step(params, mstate, opt_state, batch, key):
        return base_step(params, mstate, opt_state, batch, key,
                         jnp.int32(0))
else:
    cfg = ExperimentConfig(do_train=True, graph_type="combined",
                           num_rnn_layers=2, max_seq_len=t,
                           dtype=dtype, batch_tile=36).finalize()
    bundle = build_model(cfg)
    params, mstate = bundle.init(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    step = make_train_step(supervised_loss_fn(bundle, "detection"),
                           optimizer, donate=False)
    x = jnp.asarray(rng.randn(b, t, 19, 100), jnp.float32)
    y = jnp.asarray(rng.randint(0, 2, (b,)), jnp.float32)
    lens = jnp.full((b,), t, jnp.int32)
    sup = compute_supports_jnp(
        jnp.asarray(np.abs(rng.randn(b, 19, 19)), np.float32), "laplacian")
    batch = {"x": x, "y": y, "seq_lengths": lens, "supports": sup,
             "valid": jnp.int32(b)}
for _ in range(5):
    params, mstate, opt_state, loss = step(params, mstate, opt_state, batch, key)
print("warm loss", float(loss))
t0 = time.perf_counter()
iters = 40
for _ in range(iters):
    params, mstate, opt_state, loss = step(params, mstate, opt_state, batch, key)
float(loss)
dt = time.perf_counter() - t0
print(f"clips/s {b*iters/dt:.0f}  step_ms {1000*dt/iters:.3f}")

logdir = "/tmp/xprof_step"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
for _ in range(10):
    params, mstate, opt_state, loss = step(params, mstate, opt_state, batch, key)
float(loss)
jax.profiler.stop_trace()

from xprof.convert import raw_to_tool_data as rtd
runs = glob.glob(f"{logdir}/plugins/profile/*")
data, _ = rtd.xspace_to_tool_data(glob.glob(runs[0] + "/*.xplane.pb"),
                                  "hlo_stats", {})
import csv, io, collections
rows = list(csv.DictReader(io.StringIO(data.decode() if isinstance(data, bytes) else data)))
cat = collections.Counter()
name_t = collections.Counter()
for r in rows:
    us = float(r.get("Total Self Time (us)") or r.get("total_self_time_us") or 0)
    c = r.get("HLO Category") or r.get("category") or "?"
    cat[c] += us
    name_t[(c, (r.get("HLO Op Name") or "?")[:70])] += us
print("\n== per-category (ms over 10 steps) ==")
for c, us in cat.most_common(20):
    print(f"{us/1000:8.2f}  {c}")
print("\n== top ops ==")
for (c, nme), us in name_t.most_common(30):
    print(f"{us/1000:8.2f}  {c:28s} {nme}")
