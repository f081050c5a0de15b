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


def worker_main(argv: List[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", type=str, required=True)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--local-batch", type=int, default=4)
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
    from ..models.config import CouplingCfg, DenseBlockCfg, FlowCfg
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

    cfg = FlowCfg(
        H=8, W=8, C=3, nflows=1, nsplit=1,
        couple=CouplingCfg(0.75, DenseBlockCfg(8, 1, "LeakyReLU")),
        prior_nn=DenseBlockCfg(8, 1, "LeakyReLU"),
    )
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

    report = {
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

    return {
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
    else:
        worker_main()
