"""Multi-host (multi-process) runtime for pod-scale meshes.

The reference is a single-process, single-GPU codebase (SURVEY.md §2.4:
``torch.device("cuda:0")`` everywhere, no ``torch.distributed`` import in
the tree). Scaling the attack past one TPU slice therefore has no
reference counterpart; this module is the framework's multi-host story,
per the §5 comm-backend plan: **XLA collectives over ICI within a slice,
DCN across slices, ``jax.distributed.initialize`` for process wire-up,
no external NCCL/MPI dependency.**

Design notes (why this is thin by intention):

* After :func:`initialize` the single-controller illusion holds:
  ``jax.devices()`` returns the GLOBAL device list on every process, and
  the existing mesh code (``parallel/mesh.py``, ``parallel/knn_shard.py``)
  works unchanged — ``jax.device_put(host_array, NamedSharding(...))``
  accepts a host-global array on every process and materializes only the
  addressable shards locally, so each host pays HBM only for its chips'
  rows while the program stays identical to the single-host one.
* Every process must run the SAME program on the SAME data order (the
  usual SPMD contract). The attack drivers already satisfy this: image
  loading is deterministic (sorted recursive glob, ``io/images.py``) and
  the search itself is stateless.
* Replicated outputs (``P()`` — what the sharded/streamed searches
  return) are fully addressable everywhere and ``np.asarray`` just works.
  Ring-layout outputs are sharded ``P(axis)``; gather them with
  :func:`gather_to_host` before saving artifacts.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

_COORD_ENV = "GANLEAKS_COORDINATOR"        # host:port of process 0
_NPROC_ENV = "GANLEAKS_NUM_PROCESSES"
_PID_ENV = "GANLEAKS_PROCESS_ID"


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> tuple[int, int]:
    """Wire up the multi-process runtime; returns (process_id, n_processes).

    Resolution order for each parameter: explicit argument →
    ``GANLEAKS_*`` env var → jax's own autodetection (TPU pod metadata /
    cluster envs, where ``jax.distributed.initialize()`` needs no
    arguments at all). On a plain single-process run — no arguments, no
    env, no pod metadata — this is a NO-OP returning ``(0, 1)`` rather
    than an error, so the same entry scripts run anywhere.

    Idempotent: a second call returns the current topology without
    re-initializing (jax forbids double initialization).
    """
    coordinator_address = coordinator_address or os.environ.get(_COORD_ENV)
    if num_processes is None and os.environ.get(_NPROC_ENV):
        num_processes = int(os.environ[_NPROC_ENV])
    if process_id is None and os.environ.get(_PID_ENV):
        process_id = int(os.environ[_PID_ENV])

    # gate on the distributed client's own state, NOT jax.process_count():
    # process_count() initializes the XLA backend as a side effect, which
    # would guarantee the initialize() below can never succeed
    try:
        already = jax.distributed.is_initialized()
    except AttributeError:  # older jax
        from jax._src import distributed as _dist
        already = _dist.global_state.client is not None

    # Partial EXPLICIT config must fail loudly, not degrade: with
    # num_processes/process_id set but no coordinator (and no pod
    # metadata), every rank would silently come up as an independent
    # single-process "process 0" — N redundant full-size runs all
    # believing they are is_main, race-writing the same save_dir.
    # Checked only when NOT already wired up: a live multi-process
    # runtime (outer launcher, earlier explicit initialize()) keeps the
    # idempotency promise and just reports the current topology.
    if (not already and coordinator_address is None
            and not _pod_autodetect()
            and ((num_processes or 1) > 1 or (process_id or 0) > 0)):
        raise ValueError(
            f"multihost: num_processes={num_processes} "
            f"process_id={process_id} but no coordinator address "
            f"({_COORD_ENV}) and no pod metadata — refusing to run "
            f"single-process with multi-process config")
    if not already and (coordinator_address or _pod_autodetect()):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        except RuntimeError as e:
            msg = str(e).lower()
            # "already initialized" from an outer harness is fine; a real
            # wire-up failure (bad coordinator, rank clash) is not
            if "already" in msg:
                pass
            elif "before any jax" in msg and not coordinator_address:
                # pod-shaped env vars but the backend is already live in
                # this (single) process — e.g. single-host TPU images
                # that export TPU_WORKER_HOSTNAMES=localhost, notebooks,
                # tests. Autodetection is best-effort: stay
                # single-process. An EXPLICIT coordinator request still
                # raises — the user asked for a cluster we cannot join.
                print("[multihost] backend already initialized in this "
                      "process; continuing single-process")
            else:
                raise
    return jax.process_index(), jax.process_count()


def _pod_autodetect() -> bool:
    """True when jax can self-configure the cluster (TPU pod metadata or
    a recognized cluster environment) — the no-argument initialize path."""
    env = os.environ
    return bool(env.get("TPU_WORKER_HOSTNAMES")
                or env.get("MEGASCALE_COORDINATOR_ADDRESS")
                or env.get("CLOUD_TPU_TASK_ID"))


def global_mesh(n_chips: int | None = None,
                axis: str = "syn") -> Mesh | None:
    """1-D mesh over the GLOBAL device list (all hosts). ``n_chips``
    defaults to every device; None for the trivial 1-device case.

    Within one slice the mesh axis rides ICI; across slices/hosts jax
    routes the same collectives over DCN — the program doesn't change,
    only the interconnect does (SURVEY.md §2.4). For embarrassingly
    parallel sweeps across slices prefer independent per-slice runs.
    """
    devs = jax.devices()
    n = n_chips or len(devs)
    if n > len(devs):
        raise ValueError(f"n_chips={n} but only {len(devs)} global devices")
    if n <= 1:
        return None
    return Mesh(np.asarray(devs[:n]), (axis,))


def gather_to_host(arr: jax.Array) -> np.ndarray:
    """Host numpy copy of a possibly cross-host-sharded array.

    Replicated arrays copy directly; sharded ones all-gather over the
    mesh first (``multihost_utils.process_allgather`` — every process
    gets the full value, so artifact writing stays rank-agnostic)."""
    if arr.is_fully_addressable:
        return np.asarray(arr)
    from jax.experimental import multihost_utils
    return np.asarray(
        multihost_utils.process_allgather(arr, tiled=True))
