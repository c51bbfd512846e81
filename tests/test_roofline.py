"""Pin the roofline cost model (utils/roofline.py) used by bench.py."""

from whisperlive_tpu.models.whisper import WHISPER_CONFIGS
from whisperlive_tpu.utils import roofline


def test_decode_step_cost_large_v3_magnitudes():
    cfg = WHISPER_CONFIGS["large-v3"]
    step = roofline.decode_step_cost(cfg, batch=8, cache_len=144)
    # per-item matmul work is ~1.26 GFLOPs (32 layers × 24d²) + logits
    # (2dV ≈ 0.13 G) + attention reads; ×8 items ≈ 12-14 GFLOPs per step
    assert 10e9 < step.flops < 16e9
    # int8 decoder weights ≈ 12·32·1280² + 51866·1280 ≈ 0.70 GB, shared
    assert 0.6e9 < step.weight_bytes < 0.8e9
    # per-item KV: int8 cross (32·2·1500·1280 ≈ 0.123 GB) + bf16 self-KV
    # (32·2·144·1280·2 ≈ 0.024 GB) → ×8 ≈ 1.17 GB
    assert 1.0e9 < step.kv_bytes < 1.4e9
    assert step.bytes == step.weight_bytes + step.kv_bytes
    # elements = bytes minus one extra byte per bf16 self-KV element
    self_kv_elems = 8 * 32 * 2 * 144 * 1280
    assert abs(step.elements - (step.bytes - self_kv_elems)) < 1


def test_step_cost_scales():
    cfg = WHISPER_CONFIGS["large-v3"]
    b8 = roofline.decode_step_cost(cfg, 8, 144)
    b16 = roofline.decode_step_cost(cfg, 16, 144)
    # weights are batch-shared; KV scales linearly
    assert b16.weight_bytes == b8.weight_bytes
    assert abs(b16.kv_bytes - 2 * b8.kv_bytes) < 1
    # reduced-context cross-KV (512 of 1500 positions) cuts cross bytes ~3x
    short = roofline.decode_step_cost(cfg, 8, 144, cross_ctx=512)
    assert short.kv_bytes < 0.45 * b8.kv_bytes + 8 * 32 * 2 * 144 * 1280 * 2
    # int4 halves cross bytes vs int8
    i4 = roofline.decode_step_cost(cfg, 8, 144, cross_kv_bits=4)
    assert i4.kv_bytes < b8.kv_bytes


def test_window_flops_encoder_dominates():
    cfg = WHISPER_CONFIGS["large-v3"]
    insert = roofline.window_insert_flops(cfg, batch=1, prompt_pad=16)
    # encoder ≈ 32 × (24·1500·1280² + 4·1500²·1280) ≈ 2.25e12 FLOPs/item
    assert 2.0e12 < insert < 3.2e12
    total = roofline.window_flops(cfg, 1, 16, 144, new_tokens=120)
    assert total > insert
    # 120 decode steps ≈ 0.19 TFLOPs — under 10% of the window
    assert (total - insert) < 0.15 * insert


def test_peaks():
    f, b = roofline.nominal_peaks("TPU v5 lite")
    assert f == 197e12 and b == 819e9
    f, b = roofline.nominal_peaks("unknown-device")
    assert f == roofline.DEFAULT_PEAK[0]
    ef, eb = roofline.effective_peaks()
    assert ef > 0 and eb > 0


def test_measure_effective_peaks_and_step_roof():
    """The overlap probe returns all five envelopes (tiny shapes on CPU),
    and step_time_roof built on them is positive, scales with batch, and
    respects the max(compute, stream) form."""
    from whisperlive_tpu.utils import roofline

    peaks = roofline.measure_effective_peaks(
        iters=2, n=128, chain=2, kv_shape=(2, 2, 64, 8), inner=2
    )
    assert set(peaks) == {
        "tflops", "bf16_gbps", "int8_gbps", "bf16_geps", "int8_geps",
        "int8_mm_gbps",
    }
    assert all(v > 0 for v in peaks.values())

    from whisperlive_tpu.models.whisper import WHISPER_CONFIGS

    cfg = WHISPER_CONFIGS["tiny"]
    s1 = roofline.decode_step_cost(cfg, 1, 144)
    s8 = roofline.decode_step_cost(cfg, 8, 144)
    # the dtype split partitions the total traffic exactly
    for s in (s1, s8):
        assert abs((s.int8_bytes + s.bf16_bytes) - s.bytes) < 1e-6 * s.bytes
    r1 = roofline.step_time_roof(s1, peaks)
    r8 = roofline.step_time_roof(s8, peaks)
    assert 0 < r1 < r8
    # fallback path (no probe) also returns a positive bound
    assert roofline.step_time_roof(s1, {}) > 0


def test_continuous_step_cost_length_aware():
    """continuous_step_cost (utils/roofline.py): at full occupancy and
    full cross lengths it must agree with decode_step_cost's traffic
    model; fewer streamed positions shrink only the cross-KV int8 term
    (weights + self-KV stay full-pool — XLA batch ops have no skip)."""
    from whisperlive_tpu.models.whisper import WHISPER_CONFIGS
    from whisperlive_tpu.utils import roofline

    cfg = WHISPER_CONFIGS["tiny"]
    n_rows, cache_len, ctx = 8, 144, 640
    full = roofline.decode_step_cost(cfg, n_rows, cache_len, cross_ctx=ctx)
    cont_full = roofline.continuous_step_cost(
        cfg, n_rows, cache_len, cross_positions=n_rows * ctx
    )
    assert abs(cont_full.bytes - full.bytes) < 1e-6 * full.bytes
    assert abs(cont_full.elements - full.elements) < 1e-6 * full.elements
    assert abs(cont_full.flops - full.flops) < 1e-6 * full.flops

    half = roofline.continuous_step_cost(
        cfg, n_rows, cache_len, cross_positions=n_rows * ctx / 2
    )
    assert half.weight_bytes == cont_full.weight_bytes
    assert half.bf16_bytes == cont_full.bf16_bytes  # self-KV unchanged
    assert half.int8_bytes < cont_full.int8_bytes
    assert half.bytes < cont_full.bytes
    # the dtype split still partitions the total exactly
    assert abs((half.int8_bytes + half.bf16_bytes) - half.bytes) < 1e-6 * half.bytes
