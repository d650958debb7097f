"""End-to-end multi-host CLI test: the actual `train_ssl` entry point run
as TWO coordinated processes (2 CPU devices each → a 4-device global mesh),
exercising initialize_distributed, per-host loader shards, global-array
assembly in the device feed, the sharded train step, checkpointing on
process 0, and multi-host validation."""

import os
import socket
import subprocess
import sys

import numpy as np


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_train_ssl_two_processes(tmp_path):
    from medical_image_segmentation_tpu.data.store import StoreWriter

    rng = np.random.default_rng(0)
    for name, n in (("train.mis", 64), ("val.mis", 32)):
        with StoreWriter(str(tmp_path / name), channels=3, with_labels=True) as w:
            for i in range(n):
                w.add(rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8), label=i % 4)

    port = _free_port()
    ckpt_dir = str(tmp_path / "ckpt")
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(i),
            "CIFAR10_TRAIN_STORE": str(tmp_path / "train.mis"),
            "CIFAR10_VAL_STORE": str(tmp_path / "val.mis"),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "medical_image_segmentation_tpu.train.train_ssl",
             "--dataset", "CIFAR10", "--batch_size", "16", "--max_epochs", "2",
             "--hidden_dim", "32", "--projection_dim", "8",
             "--limit_steps_per_epoch", "2", "--num_workers", "1", "--fp32",
             "--checkpoint_dir", ckpt_dir, "--log_dir", str(tmp_path / f"logs{i}"),
             "--warmup_epochs", "1"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        ))
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
    # only process 0 logs/checkpoints
    assert "epoch 0: loss=" in outs[0]
    assert "val/acc@1" in outs[0]
    steps = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    assert steps, f"no checkpoint written:\n{outs[0][-2000:]}"
