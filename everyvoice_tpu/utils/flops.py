"""FLOPs accounting for benchmark MFU reporting (new TPU-first work; the
reference publishes no performance numbers at all — SURVEY.md §6).

MFU (model FLOPs utilization) = achieved FLOPs/s ÷ the chip's peak matmul
FLOPs/s. Achieved FLOPs come from XLA's own cost analysis of the compiled
executable — the honest count of what the program actually executes,
including padding waste — not a hand-derived formula that silently drifts
from the model.
"""

from __future__ import annotations

from typing import Optional

# Peak dense matmul throughput per chip, bf16, FLOPs/s (from the public TPU
# system specs; f32 on the MXU is ~half of bf16).
_PEAK_BF16 = {
    "v4": 275e12,
    "v5 lite": 197e12,  # v5e ("TPU v5 lite" device kind)
    "v5e": 197e12,
    "v5p": 459e12,
    "v5": 459e12,
    "v6 lite": 918e12,
    "v6e": 918e12,
}


def peak_flops(device) -> Optional[float]:
    """Peak bf16 FLOPs/s for a jax device, or None when unknown (CPU, new
    chip generations)."""
    kind = getattr(device, "device_kind", "").lower()
    if "tpu" not in kind and device.platform not in ("tpu", "axon"):
        return None
    for marker, peak in _PEAK_BF16.items():
        if marker in kind:
            return peak
    return None


def compiled_flops(jitted_fn, *args, **kwargs) -> Optional[float]:
    """Total FLOPs of one execution of `jitted_fn(*args)`, from XLA's cost
    analysis of the lowered+compiled executable. Returns None when the
    backend does not report a flop count."""
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax: one dict per module
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def mfu(flops_per_step: Optional[float], seconds_per_step: float,
        device) -> Optional[float]:
    """Achieved-FLOPs / peak for one step; None when either side is
    unknown."""
    peak = peak_flops(device)
    if not flops_per_step or not peak or seconds_per_step <= 0:
        return None
    return flops_per_step / seconds_per_step / peak
