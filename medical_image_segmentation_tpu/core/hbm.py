"""Projected-HBM guard: predict a step's device-memory footprint BEFORE running it.

Motivation (BASELINE.md, seg3d batch sweep): the volumetric train step falls
off a cliff between batch 96 (284 vol/s) and batch 112 (34.9 vol/s) on a v5e
chip — an ~8x silent degradation from HBM oversubscription. XLA compiles and
*runs* the oversubscribed program (spilling/rematerializing through host or
suboptimal schedules) instead of failing, so a user who picks the wrong batch
size gets no signal. The reference cannot express this check at all (PyTorch
allocates lazily and OOMs mid-step); on TPU the compiler knows the whole
program's memory plan ahead of time — `compiled.memory_analysis()` — so we
surface it.

Usage:
    report = hbm_report(jitted_fn, *args)        # AOT lower+compile (cheap on
                                                 # CPU meshes; one extra compile
                                                 # on device unless the caller
                                                 # reuses it — see note)
    check_hbm(report, force=..., label="train step")

Note on the axon remote-TPU platform: AOT-compiling the SAME `jax.jit`
wrapper that a benchmark later times perturbs its dispatch path (measured in
bench.py round 2: 78 ms -> 1.7 s/step). Benchmarks therefore run the analysis
AFTER timing; trainers run it up front on a THROWAWAY jit wrapper of the same
step function (the one-off compile cost is the price of the guard, amortized
by the persistent compilation cache when `JAX_COMPILATION_CACHE_DIR` is set).
"""

from __future__ import annotations

import sys
from typing import Any, Dict, Optional

import jax


# Usable HBM by device kind when the PJRT plugin exposes no memory_stats
# (the axon remote-TPU plugin returns bytes_limit=None). Values are the
# allocator limits XLA itself reports on OOM (round-2 measured resnet152
# OOM: "17.01 G vs 15.75 G" on v5e), slightly below the marketing HBM size.
_KNOWN_HBM_BYTES = {
    "tpu v4": 32_000_000_000,
    "tpu v5 lite": 15_750_000_000,
    "tpu v5e": 15_750_000_000,
    "tpu v5p": 94_000_000_000,
    "tpu v5": 94_000_000_000,
    "tpu v6 lite": 31_500_000_000,
    "tpu v6e": 31_500_000_000,
}


def _capacity_for_kind(kind: str) -> Optional[int]:
    """Longest-match lookup in the known-HBM table (so 'tpu v5 lite' hits the
    lite row, not the bare 'tpu v5' one)."""
    kind = kind.lower()
    for k, v in sorted(_KNOWN_HBM_BYTES.items(), key=lambda kv: -len(kv[0])):
        if k in kind:
            return v
    return None


def device_hbm_capacity() -> Optional[int]:
    """Per-device accelerator memory in bytes, or None when unknown (CPU
    backends report no limit; the virtual test mesh returns None). Prefers
    the runtime's own memory_stats; falls back to the known per-device-kind
    table when the plugin hides it (axon)."""
    try:
        dev = jax.devices()[0]
        if dev.platform == "cpu":
            return None
        stats = dev.memory_stats()
        if stats:
            limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
            if limit:
                return int(limit)
        return _capacity_for_kind(dev.device_kind)
    except Exception:
        pass
    return None


def memory_analysis_of(compiled) -> Optional[Dict[str, int]]:
    """Extract XLA's static memory plan from a compiled executable.

    Returns sizes in bytes: ``temp`` (XLA scratch — activations, workspaces),
    ``arguments``, ``outputs``, ``aliased`` (donated-input bytes reused for
    outputs), and ``projected_peak`` = arguments + outputs + temp - aliased,
    the executable's whole-program live-set bound. The projected peak is what
    must fit in HBM alongside nothing else (jit programs own the chip).
    """
    try:
        ma = compiled.memory_analysis()
    except Exception:
        return None
    if ma is None:
        return None

    def g(name: str) -> int:
        return int(getattr(ma, name, 0) or 0)

    temp = g("temp_size_in_bytes")
    args_b = g("argument_size_in_bytes")
    out = g("output_size_in_bytes")
    alias = g("alias_size_in_bytes")
    peak = args_b + out + temp - alias
    return {
        "temp": temp,
        "arguments": args_b,
        "outputs": out,
        "aliased": alias,
        "projected_peak": peak,
    }


def hbm_report(jitted_fn, *args, **kwargs) -> Optional[Dict[str, Any]]:
    """AOT-compile ``jitted_fn`` for ``args`` and report projected peak HBM
    vs. device capacity.

    Returns None when the backend exposes neither memory analysis nor a
    capacity (e.g. some CPU configurations); otherwise a dict with byte
    counts, ``capacity`` (None when unknown), and ``oversubscribed``
    (False when capacity is unknown).
    """
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
    except Exception:
        return None
    mem = memory_analysis_of(compiled)
    if mem is None:
        return None
    cap = device_hbm_capacity()
    mem["capacity"] = cap
    mem["oversubscribed"] = bool(cap is not None and mem["projected_peak"] > cap)
    return mem


def format_hbm_report(mem: Dict[str, Any], label: str = "step") -> str:
    gb = 1024.0**3
    cap = mem.get("capacity")
    cap_s = f"{cap / gb:.2f} GiB" if cap else "unknown"
    return (
        f"projected HBM for {label}: {mem['projected_peak'] / gb:.2f} GiB "
        f"(args {mem['arguments'] / gb:.2f} + outputs {mem['outputs'] / gb:.2f} "
        f"+ temps {mem['temp'] / gb:.2f} - donated {mem['aliased'] / gb:.2f}) "
        f"vs capacity {cap_s}"
    )


def guard_step(
    jitted_step,
    example_args,
    label: str = "train step",
    skip: bool = False,
    force: bool = False,
) -> Optional[Dict[str, Any]]:
    """One-call trainer guard: AOT-compile ``jitted_step`` at the given arg
    specs (``jax.ShapeDtypeStruct`` or concrete values) and refuse if XLA's
    static memory plan oversubscribes the device (``check_hbm`` semantics).

    No-op (returns None) when ``skip`` is set or when the backend has no
    known capacity — CPU backends and the virtual test mesh — so tests and
    CPU dry-runs never pay the compile. All four trainers share this exact
    sequence; the seg3d spill cliff (284 → 34.9 vol/s, BASELINE.md) and the
    round-2 resnet152 b1024 OOM are the measured failure modes it predicts.
    """
    if skip or device_hbm_capacity() is None:
        return None
    mem = hbm_report(jitted_step, *example_args)
    check_hbm(mem, label=label, force=force)
    return mem


def check_hbm(
    mem: Optional[Dict[str, Any]],
    label: str = "step",
    force: bool = False,
    file=sys.stderr,
) -> None:
    """Print the projection; if it oversubscribes the device, refuse (raise
    SystemExit with the diagnosis) unless ``force``.

    The diagnosis names the fix levers: smaller batch, ``--remat``, wider
    sharding — the things a user can actually turn. A None report (backend
    without the analysis) is silently accepted.
    """
    if mem is None:
        return
    msg = format_hbm_report(mem, label)
    print(msg, file=file)
    if mem.get("oversubscribed"):
        advice = (
            f"{label}: projected peak exceeds device HBM — XLA will still run "
            "it, ~8x slower (measured: seg3d batch 112 vs 96, BASELINE.md). "
            "Lower --batch_size, enable --remat, or shard wider "
            "(--space_shards); pass --force_hbm to run anyway."
        )
        if force:
            print(f"WARNING (forced): {advice}", file=file)
        else:
            raise SystemExit(f"REFUSING: {advice}")
