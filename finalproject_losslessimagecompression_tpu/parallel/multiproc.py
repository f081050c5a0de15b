"""Multi-PROCESS distributed runtime: real jax.distributed execution.

The reference has no distributed code at all (SURVEY.md section 2); this
framework's multi-host path (init_distributed + sharded steps + sharded
loaders) was, through round 2, exercised only on single-process virtual
meshes.  This module runs the real thing: N OS processes, a localhost
coordinator, gloo CPU collectives, a global mesh spanning every process's
devices, the sharded data loader partitioning the epoch by
jax.process_index(), and a psum'd train step whose replicated results are
asserted IDENTICAL on every rank.

Two entry points:
- worker_main(): what each spawned process runs (also `python -m
  finalproject_losslessimagecompression_tpu.parallel.multiproc --process-id i`).
- launch(num_processes, ...): spawns the workers, collects their reports,
  and cross-checks them (identical final params hash + loss series,
  disjoint-and-complete epoch coverage).  Returns the summary dict that
  MULTIPROC_r03.json records.

The workers force the CPU backend (the TPU tunnel is single-process) --
the collectives/mesh/loader logic under test is backend-agnostic.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import socket
import subprocess
import sys
import tempfile
import time
from typing import List


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# ---------------------------------------------------------------------------
# worker
# ---------------------------------------------------------------------------


def _coding_shard(pid: int, batch: int):
    """Rank `pid`'s deterministic image shard for the coding phase (the
    reference worker regenerates the identical arrays by pid)."""
    import numpy as np

    crng = np.random.default_rng(1000 + pid)
    return (
        np.round(crng.uniform(0, 1, (batch, 8, 8, 3)) * 256)
        .astype(np.float32) / 256.0
    )


def _worker_flow_cfg():
    from ..models.config import CouplingCfg, DenseBlockCfg, FlowCfg

    return FlowCfg(
        H=8, W=8, C=3, nflows=1, nsplit=1,
        couple=CouplingCfg(0.75, DenseBlockCfg(8, 1, "LeakyReLU")),
        prior_nn=DenseBlockCfg(8, 1, "LeakyReLU"),
    )


def _compress_report(codec, params, x):
    """Chip-local compress + decode-verify of one shard -> report dict
    (container digest is over every segment in order)."""
    import numpy as np

    blobs, info = codec.compress(params, x)
    rec = codec.decompress(params, blobs, info, fetch=True)
    h = hashlib.sha256()
    for b in blobs:
        h.update(b)
    return {
        "container_sha256": h.hexdigest(),
        "bit_exact": bool(np.array_equal(np.asarray(rec), np.asarray(x))),
        "real_bpd": round(codec.real_bpd(blobs, info), 4),
        "nbytes": int(sum(len(b) for b in blobs)),
    }


def worker_main(argv: List[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", type=str, required=True)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--local-batch", type=int, default=4)
    ap.add_argument("--coding-batch", type=int, default=4)
    ap.add_argument("--params-out", type=str, default="",
                    help="rank 0: save the trained params here (the "
                    "reference worker codes against them)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # axon sitecustomize overrides
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from .mesh import init_distributed

    init_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..data.loader import DataLoader
    from ..models.idflow import IDFlow
    from ..train.trainer import make_train_step
    from .mesh import make_mesh
    from .sharding import shard_batch

    assert jax.process_count() == args.num_processes
    pid = jax.process_index()

    # index-stamped dataset: sample j is the constant image j/256, so the
    # batches a rank actually TRAINS ON reveal its epoch coverage
    n_samples = 8 * args.local_batch * args.num_processes

    class Stamped:
        def __len__(self):
            return n_samples

        def __getitem__(self, j):
            return np.full((8, 8, 3), j / 256.0, np.float32)

    # the sharded loader: every rank draws the same seeded permutation and
    # takes its disjoint stride (data/loader.py:64-75) -- `shard: true`
    # in configs resolves to exactly these process coordinates
    loader = DataLoader(
        Stamped(), args.local_batch, shuffle=True, train=True, seed=3,
        shard_index=pid, shard_count=args.num_processes,
    )

    cfg = _worker_flow_cfg()
    model = IDFlow(cfg)
    x0 = jnp.zeros((1, 8, 8, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0)  # same seed on all ranks
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    mesh = make_mesh()  # global: every process's devices
    step_fn, _ = make_train_step(model, opt, mesh=mesh)
    dsh = shard_batch(mesh)

    losses = []
    covered = set()
    for _ in range(args.steps):
        local = next(loader)
        covered.update(
            int(v) for v in np.round(local[:, 0, 0, 0] * 256.0)
        )
        # each rank contributes its local shard of the GLOBAL batch; the
        # train step psums gradients across the whole mesh (both hosts)
        batch = jax.make_array_from_process_local_data(dsh, local)
        params, opt_state, loss, _ = step_fn(params, opt_state, batch)
        losses.append(float(loss))  # replicated: identical on every rank

    flat = jax.tree_util.tree_leaves(jax.device_get(params))
    h = hashlib.sha256()
    for leaf in flat:
        h.update(np.ascontiguousarray(leaf).tobytes())

    # -- coding phase: each rank compresses its OWN image shard with the
    # trained params, chip-locally (streams never cross devices, let alone
    # processes).  The launcher's single-process reference worker codes
    # the same shards against the same params and asserts the containers
    # are byte-identical -- cross-PROCESS container determinism, the gap
    # VERDICT r4 item 6 named (the single-process 8-device mesh already
    # tests per-device identity; this is the real-runtime version).
    from ..models.exact import FlowCodec

    host_params = jax.device_get(params)
    codec = FlowCodec(model, num_streams=64)
    coding = _compress_report(
        codec, host_params, jnp.asarray(_coding_shard(pid, args.coding_batch))
    )
    if pid == 0 and args.params_out:
        # leaves in canonical tree-flatten order; the reference worker
        # rebuilds the same treedef from an identical model.init
        np.savez(
            args.params_out,
            *[np.asarray(leaf) for leaf in
              jax.tree_util.tree_leaves(host_params)],
        )

    report = {
        "coding": coding,
        "process_id": pid,
        "num_processes": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": len(jax.devices()),
        "mesh_shape": {k: int(v) for k, v in mesh.shape.items()},
        "losses": losses,
        "params_sha256": h.hexdigest(),
        "covered_indices": sorted(covered),
        "n_samples": n_samples,
    }
    with open(args.out, "w") as f:
        json.dump(report, f)


def reference_main(argv: List[str] | None = None) -> None:
    """Single-process reference coder: loads the trained params rank 0
    saved, compresses EVERY rank's coding shard in one ordinary process
    (no jax.distributed), and reports per-shard container digests.  Run in
    its own spawned process so the comparison is genuinely
    cross-process."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", type=str, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coding-batch", type=int, default=4)
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # axon sitecustomize overrides

    import jax.numpy as jnp
    import numpy as np

    from ..models.exact import FlowCodec
    from ..models.idflow import IDFlow

    model = IDFlow(_worker_flow_cfg())
    init = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3), jnp.float32)
    )
    treedef = jax.tree_util.tree_structure(init)
    with np.load(args.params) as z:
        leaves = [z[f"arr_{i}"] for i in range(len(z.files))]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    codec = FlowCodec(model, num_streams=64)
    shards = [
        _compress_report(
            codec, params,
            jnp.asarray(_coding_shard(pid, args.coding_batch)),
        )
        for pid in range(args.num_processes)
    ]
    with open(args.out, "w") as f:
        json.dump({"shards": shards}, f)


# ---------------------------------------------------------------------------
# launcher
# ---------------------------------------------------------------------------


def launch(num_processes: int = 2, steps: int = 8, local_batch: int = 4,
           local_devices: int = 2, timeout_s: float = 600.0) -> dict:
    """Spawn the workers, cross-check their reports, return the summary."""
    port = _free_port()
    coord = f"localhost:{port}"
    tmp = tempfile.mkdtemp(prefix="lic_multiproc_")
    outs = [os.path.join(tmp, f"rank{i}.json") for i in range(num_processes)]
    params_path = os.path.join(tmp, "params.npz")
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    t0 = time.time()
    for i in range(num_processes):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m",
                    "finalproject_losslessimagecompression_tpu.parallel"
                    ".multiproc",
                    "--process-id", str(i),
                    "--num-processes", str(num_processes),
                    "--coordinator", coord,
                    "--out", outs[i],
                    "--steps", str(steps),
                    "--local-batch", str(local_batch),
                    "--params-out", params_path,
                ],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout_s)
        logs.append(out.decode(errors="replace"))
        if p.returncode != 0:
            raise RuntimeError(
                f"worker rc={p.returncode}:\n" + logs[-1][-2000:]
            )
    reports = []
    for o in outs:
        with open(o) as f:
            reports.append(json.load(f))

    # -- cross-rank assertions -----------------------------------------
    shas = {r["params_sha256"] for r in reports}
    assert len(shas) == 1, f"params diverged across ranks: {shas}"
    loss_series = {tuple(r["losses"]) for r in reports}
    assert len(loss_series) == 1, "replicated losses differ across ranks"
    cov = [set(r["covered_indices"]) for r in reports]
    union = set().union(*cov)
    for i in range(len(cov)):
        for j in range(i + 1, len(cov)):
            inter = cov[i] & cov[j]
            assert not inter, f"ranks {i},{j} shared samples: {inter}"
    n_samples = reports[0]["n_samples"]
    seen_per_rank = n_samples // num_processes
    # `steps` local batches per rank cover min(steps*local_batch, shard)
    expect = min(steps * local_batch, seen_per_rank)
    assert all(len(c) == expect for c in cov), [len(c) for c in cov]

    # -- coding cross-check: spawn the single-process reference coder on
    # rank 0's saved params and assert every rank's container is
    # byte-identical (digest) to the reference compress of that shard
    assert all(r["coding"]["bit_exact"] for r in reports)
    ref_out = os.path.join(tmp, "reference.json")
    ref = subprocess.run(
        [
            sys.executable, "-m",
            "finalproject_losslessimagecompression_tpu.parallel.multiproc",
            "--reference",
            "--params", params_path,
            "--num-processes", str(num_processes),
            "--out", ref_out,
        ],
        env=env, capture_output=True, timeout=timeout_s,
    )
    if ref.returncode != 0:
        raise RuntimeError(
            "reference coder rc=%d:\n%s"
            % (ref.returncode, ref.stdout.decode(errors="replace")[-2000:]
               + ref.stderr.decode(errors="replace")[-2000:])
        )
    with open(ref_out) as f:
        ref_shards = json.load(f)["shards"]
    rank_digests = [r["coding"]["container_sha256"] for r in reports]
    ref_digests = [s["container_sha256"] for s in ref_shards]
    assert rank_digests == ref_digests, (
        f"containers diverged across processes: ranks={rank_digests} "
        f"reference={ref_digests}"
    )

    return {
        "coding": {
            "byte_identical": True,
            "per_rank_container_sha256": rank_digests,
            "per_rank_real_bpd": [
                r["coding"]["real_bpd"] for r in reports
            ],
            "bit_exact": True,
            "note": "each rank compressed its image shard chip-locally "
                    "with the trained params; a separately spawned "
                    "single-process coder reproduced every container "
                    "byte-identically",
        },
        "ok": True,
        "num_processes": num_processes,
        "global_devices": reports[0]["global_devices"],
        "local_devices": reports[0]["local_devices"],
        "mesh_shape": reports[0]["mesh_shape"],
        "steps": steps,
        "identical_params_sha256": reports[0]["params_sha256"],
        "identical_loss_series": reports[0]["losses"],
        "epoch_coverage": {
            "per_rank_samples": [len(c) for c in cov],
            "disjoint": True,
            "union_size": len(union),
        },
        "wall_s": round(time.time() - t0, 2),
        "collectives": "gloo (CPU backend; same init path as TPU multi-host"
                       " via parallel.mesh.init_distributed)",
    }


if __name__ == "__main__":
    if "--launch" in sys.argv:
        i = sys.argv.index("--launch")
        n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 2
        print(json.dumps(launch(n), indent=1))
    elif "--reference" in sys.argv:
        argv = [a for a in sys.argv[1:] if a != "--reference"]
        reference_main(argv)
    else:
        worker_main()
