"""Multi-host launch helper (ref: main_esvit_mnodes.py + utils.py:442-465).

The reference spawns one torch.distributed process per GPU via
``torch.distributed.launch`` with NCCL rendezvous over MASTER_ADDR/PORT,
reading SLURM or OpenMPI environment variables. The TPU-native model is one
process per HOST and a single ``jax.distributed.initialize`` call; all
collectives afterwards are compiler-scheduled over ICI/DCN. This module
resolves the coordinator from the same environment conventions so existing
SLURM/MPI launch scripts keep working:

    # SLURM:   srun python -m esvit_tpu.train.train --distributed ...
    # OpenMPI: mpirun -n <hosts> python -m esvit_tpu.train.train --distributed
    # manual:  MASTER_ADDR=host0 MASTER_PORT=1234 WORLD_SIZE=4 RANK=i ...

On Cloud TPU pods, ``jax.distributed.initialize()`` with no arguments
auto-discovers everything; env-based resolution is the fallback.
"""

from __future__ import annotations

import os
from typing import Optional


def resolve_distributed_env() -> Optional[dict]:
    """Coordinator spec from SLURM / OpenMPI / torch-style env vars
    (mirrors utils.py:443-449 and main_esvit_mnodes.py:77-92)."""
    env = os.environ
    if "SLURM_PROCID" in env and "SLURM_NTASKS" in env:
        nodelist = env.get("SLURM_STEP_NODELIST", env.get("SLURM_NODELIST", ""))
        head = nodelist.split(",")[0].split("[")[0] if nodelist else "localhost"
        return {
            "coordinator_address": f"{head}:{env.get('MASTER_PORT', '12355')}",
            "num_processes": int(env["SLURM_NTASKS"]),
            "process_id": int(env["SLURM_PROCID"]),
        }
    if "OMPI_COMM_WORLD_SIZE" in env:
        addr = env.get("MASTER_ADDR", "localhost")
        port = env.get("MASTER_PORT", "12355")
        return {
            "coordinator_address": f"{addr}:{port}",
            "num_processes": int(env["OMPI_COMM_WORLD_SIZE"]),
            "process_id": int(env["OMPI_COMM_WORLD_RANK"]),
        }
    if "WORLD_SIZE" in env and "RANK" in env:
        addr = env.get("MASTER_ADDR", "localhost")
        port = env.get("MASTER_PORT", "12355")
        return {
            "coordinator_address": f"{addr}:{port}",
            "num_processes": int(env["WORLD_SIZE"]),
            "process_id": int(env["RANK"]),
        }
    return None


def initialize_distributed(verbose: bool = True) -> None:
    """jax.distributed.initialize with env fallback. Safe to call once per
    process before any jax computation."""
    import jax

    spec = resolve_distributed_env()
    if spec is None:
        # TPU pod auto-discovery (GCE metadata) or single host.
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(**spec)
    if verbose:
        print(f"jax.distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices", flush=True)
