"""Timed multi-process decision-step worker (scaling measurement).

Launched by tpu_trials/scaling_mh.py as
``python scaling_mh_worker.py <pid> <nproc> <n_local> <port> <layout>``
with layout in {good, bad}:

  good — parallel/mesh.make_mesh order: the "index" axis is packed
         INSIDE each process, so the step's only collectives (anchor
         all_gather + extension pmax) stay on the intra-process
         fabric (ICI on a pod) and the cross-process fabric (DCN /
         Gloo here) carries zero aligner traffic.
  bad  — device order transposed so each index pair SPANS the two
         processes: every all_gather/pmax crosses the Gloo fabric.

Every process times the same ITERS warm steps; pid 0 prints one JSON
line {"nproc":, "layout":, "ms_per_step":}.  Total devices are held
constant (nproc * n_local == 8) so the number isolates the layout /
process-count effect, not device count.
"""
import json
import os
import sys
import time

pid, nproc, n_local, port, layout = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
    int(sys.argv[4]), sys.argv[5],
)
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={n_local}"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
if nproc > 1:
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mappy_rs_tpu.config import MapOptions  # noqa: E402
from mappy_rs_tpu.index.build import load_or_build  # noqa: E402
from mappy_rs_tpu.ops.chain import ChainParams  # noqa: E402
from mappy_rs_tpu.ops.extend import ExtendParams  # noqa: E402
from mappy_rs_tpu.parallel.mesh import (  # noqa: E402
    build_sharded_map_step,
    shard_index_by_key_range,
)
from mappy_rs_tpu.parallel.multihost import (  # noqa: E402
    P,
    put_global,
    put_global_tree,
    shard_specs_for_index,
)
from mappy_rs_tpu.utils.seqcodes import encode, read_fastx  # noqa: E402

N_INDEX = 2
B, L = 64, 512
ITERS = 10

devices = jax.devices()
assert len(devices) == nproc * n_local
if layout == "bad" and nproc > 1:
    # interleave processes so index partners cross the Gloo fabric:
    # order = [p0d0, p1d0, p0d1, p1d1, ...] -> reshape(-1, 2) pairs
    # one device from each process along "index"
    by_proc = [
        [d for d in devices if d.process_index == p] for p in range(nproc)
    ]
    devices = [d for tup in zip(*by_proc) for d in tup]
devs = np.asarray(devices).reshape(len(devices) // N_INDEX, N_INDEX)
mesh = jax.sharding.Mesh(devs, ("data", "index"))

idx = load_or_build("/root/reference/resources/test/test.mmi")
opt = MapOptions()
idx.update_map_options(opt)
seqs = [s for _, s in read_fastx("/root/reference/resources/test/test.fa")]
codes = np.full((B, L), 4, np.uint8)
lens = np.zeros(B, np.int32)
for i in range(B):
    s = encode(seqs[i % len(seqs)])
    codes[i, : len(s)] = s
    lens[i] = len(s)

cp = ChainParams(
    max_dist_x=opt.max_gap, max_dist_y=opt.max_gap, bw=opt.bw,
    q_span=idx.k, chn_pen_gap=opt.chain_gap_scale * 0.01 * idx.k,
    chn_pen_skip=0.0,
)
ep = ExtendParams(
    a=opt.a, b=opt.b, q=opt.q, e=opt.e, q2=opt.q2, e2=opt.e2,
    sc_ambi=opt.sc_ambi,
)
step = build_sharded_map_step(
    mesh, idx.k, idx.w, max_minimizers=64, max_anchors=128,
    chain_params=cp, ext_params=ep, mid_occ=opt.mid_occ,
    chain_window=16, ext_window=64,
)
shards_np = shard_index_by_key_range(idx, N_INDEX)
codes_d = put_global(codes, mesh, P("data", None))
lens_d = put_global(lens, mesh, P("data"))
shards = put_global_tree(shards_np, mesh, shard_specs_for_index())

jax.block_until_ready(step(codes_d, lens_d, shards))  # compile + warm
t0 = time.time()
for _ in range(ITERS):
    out = step(codes_d, lens_d, shards)
jax.block_until_ready(out)
dt = (time.time() - t0) / ITERS
if pid == 0:
    print(json.dumps({
        "nproc": nproc, "layout": layout,
        "ms_per_step": round(dt * 1e3, 2),
        "reads_per_step": B,
    }), flush=True)
