"""Profile ONE fused boosting round on hardware and print the top device
ops by total time — ground truth for where the 18.8 ms (no-metric round at
bench shape) actually goes, instead of config-differencing guesses.

Run: python tools/exp_round_profile.py
"""

import glob
import gzip
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp
import numpy as np

from ranklib_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

from fixtures import synth_dataset
from ranklib_tpu.data.dataset import flatten
from ranklib_tpu.gbdt.binning import bin_features, compute_thresholds
from ranklib_tpu.gbdt.boost import init_state, make_boost_data, make_round_step
from ranklib_tpu.models.gbdt import _pad_doc_count
from ranklib_tpu.metrics.base import create_scorer
from ranklib_tpu.utils.logging import set_silent

set_silent(True)
scorer = create_scorer("NDCG@10")
train = synth_dataset(n_queries=1500, n_features=136, min_docs=80,
                      max_docs=160, gmax=4, seed=3, w_seed=11, signal=2.5)
feats, labels, _ = flatten(train)
N, F = feats.shape
thresholds, _ = compute_thresholds(feats, 256)
B = thresholds.shape[1]
Npad = _pad_doc_count(N)
binned = bin_features(np.pad(feats, ((0, Npad - N), (0, 0))), thresholds)
labels_pad = np.pad(labels, (0, Npad - N)).astype(np.float32)
data, Npad, Nvpad = make_boost_data(train, binned, labels_pad, N, None,
                                    None, None, scorer=scorer)

step = make_round_step(scorer, n_bins=B, n_leaves=10, min_leaf_support=1,
                       learning_rate=0.1, pointwise=False, newton=True,
                       n_queries=1500, n_vqueries=1, train_metric=False)
state = init_state(128, 10, Npad, Nvpad, F)
state = step(state, jnp.int32(0), data)
float(state.scores[0])

logdir = "/tmp/rt_profile"
with jax.profiler.trace(logdir):
    for k in range(1, 9):
        state = step(state, jnp.int32(k), data)
    float(state.scores[0])

# parse the trace proto-agnostically via the .json.gz event dump
paths = glob.glob(logdir + "/**/*.trace.json.gz", recursive=True)
if not paths:
    print("no trace json found under", logdir)
    sys.exit(1)
path = max(paths, key=lambda p: len(p))
with gzip.open(path, "rt") as fh:
    trace = json.load(fh)
events = [e for e in trace.get("traceEvents", [])
          if e.get("ph") == "X" and "dur" in e]
# keep device-lane events only (TensorFlow Op / XLA Ops lanes carry pids
# named like '/device:TPU:0'); heuristically take the pid with the
# largest total duration that is not a host python lane
by_pid = {}
names = {}
for e in trace.get("traceEvents", []):
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
for e in events:
    by_pid.setdefault(e["pid"], []).append(e)
cand = [(sum(x["dur"] for x in v), p) for p, v in by_pid.items()
        if "TPU" in names.get(p, "") or "device" in names.get(p, "").lower()]
if not cand:
    cand = [(sum(x["dur"] for x in v), p) for p, v in by_pid.items()]
cand.sort(reverse=True)
agg = {}
for tot, pid in cand[:1]:
    print(f"device lane: pid={pid} name={names.get(pid)} "
          f"total={tot / 1e3:.1f} ms over 8 rounds", flush=True)
    for e in by_pid[pid]:
        ln = e.get("args", {}).get("long_name", "")[:110]
        key = (e["name"][:48], ln)
        agg[key] = agg.get(key, 0.0) + e["dur"]
for (k, ln), v in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{v / 8e3:8.3f} ms/round  {k}  | {ln}", flush=True)
