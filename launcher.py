"""Job launcher: config → worker module dispatch (reference launcher.py parity).

The reference resolves ``args.worker`` (a module name in the task YAML) via
importlib and spawns it once per GPU under SLURM/submitit
(launcher.py:47-93). TPU-native: one python process per *host* (not per
chip) — jax owns all local chips; multi-host runs launch this same script on
every host with env.process_id/env.coordinator set, and jax.distributed wires
DCN. No mp.spawn, no rendezvous files, no NCCL env plumbing.

Usage:
    python launcher.py --config-name deepavfusion [dotted.overrides=...]
"""
from __future__ import annotations

import importlib
import sys


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    name = "deepavfusion"
    if "--config-name" in argv:
        i = argv.index("--config-name")
        name = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]

    from deepavfusion_tpu.config import load_config
    from deepavfusion_tpu.parallel import mesh as mesh_lib

    args = load_config(name, overrides=argv)

    # eval jobs nest under the pretraining job dir (reference launcher.py:108-109)
    if args.get("pretrain_job_name"):
        args["output_dir"] = f"{args.output_dir}/{args.pretrain_job_name}"

    if args.env.get("num_processes", 1) > 1:
        mesh_lib.init_distributed(
            args.env.coordinator, args.env.num_processes, args.env.process_id
        )

    worker = importlib.import_module(args.worker)
    worker.main_worker(args)


if __name__ == "__main__":
    main()
