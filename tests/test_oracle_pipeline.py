"""Full-pipeline oracle: our offline seek loop vs transformers' long-form
WhisperForConditionalGeneration.generate with timestamps.

The reference anchors its end-to-end behavior with a WER test on real
weights (reference tests/test_server.py:73-118); with zero egress the
runnable equivalent is token-stream parity against HF's sequential
long-form decoding algorithm (generation_whisper.py), which implements the
same openai seek-loop semantics the vendored faster-whisper does
(transcriber_faster_whisper.py:1049-1337):

  * identical greedy token stream across ALL windows (covers the encoder,
    the KV-cached decode loop, every timestamp logit rule, EOT/length stop)
  * identical per-segment (start, end) boundaries and seek advances (covers
    _split_segments_by_timestamps + the window-striding math)

The tiny random model's vocab is laid out exactly like Whisper's (1501
timestamp tokens at the top, specials derived in closed form), so the real
tokenizer spec drives both sides. Both sides consume the SAME feature
array, so this isolates decode semantics from feature extraction (which
has its own parity tests in test_mel.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from whisperlive_tpu.engine.engine import TranscribeOptions, WhisperEngine
from whisperlive_tpu.engine.transcribe import generate_segments
from whisperlive_tpu.models import convert as convert_mod
from whisperlive_tpu.ops import mel as mel_ops

# n_vocab chosen so sot == 256: every text id is a raw byte for the
# hermetic byte tokenizer (no empty-text segments to desync the filters).
N_VOCAB = 1863
TINY = dict(
    vocab_size=N_VOCAB,
    num_mel_bins=80,
    d_model=64,
    encoder_layers=2,
    encoder_attention_heads=4,
    decoder_layers=2,
    decoder_attention_heads=4,
    encoder_ffn_dim=128,
    decoder_ffn_dim=128,
    max_source_positions=1500,  # full 30 s windows -> HF long-form path
    max_target_positions=448,
    pad_token_id=255,
    bos_token_id=256,
    eos_token_id=255,
    decoder_start_token_id=256,
)


@pytest.fixture(scope="module")
def oracle_pair():
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(7)
    hf = WhisperForConditionalGeneration(HFConfig(**TINY)).eval()

    cfg = convert_mod.config_from_hf(TINY)
    params = convert_mod.params_from_state_dict(hf.state_dict(), cfg)
    from whisperlive_tpu.engine.tokenizer import TokenSpec, WhisperTokenizer

    # multilingual layout: the HF side prompts [sot, lang, task] too
    tok = WhisperTokenizer(TokenSpec(N_VOCAB, multilingual=True))
    eng = WhisperEngine(
        cfg, params, tokenizer=tok, compute_dtype=jnp.float32, batch_buckets=(1,)
    )

    spec = eng.tokenizer.spec
    assert spec.sot == 256 and spec.eot == 255
    assert spec.timestamp_begin + 1500 == N_VOCAB - 1  # <|0.00|>..<|30.00|>

    gc = hf.generation_config
    gc.is_multilingual = True
    gc.lang_to_id = {"<|en|>": spec.language_token("en")}
    gc.task_to_id = {"transcribe": spec.transcribe, "translate": spec.translate}
    gc.decoder_start_token_id = spec.sot
    gc.eos_token_id = spec.eot
    gc.pad_token_id = spec.eot
    gc.bos_token_id = spec.sot
    gc.no_timestamps_token_id = spec.no_timestamps
    gc.prev_sot_token_id = spec.sot_prev
    gc.max_initial_timestamp_index = 50
    gc.max_length = 448
    # Suppress every special-range id (lang tokens, task tokens, ...) on
    # BOTH sides so sampled text is always decodable bytes — otherwise a
    # random-weight model can emit ids the byte tokenizer decodes to "",
    # which our empty-text segment filter drops but HF keeps. Also mirrors
    # the engine's always-suppressed specials + suppress_blank.
    suppressed = tuple(range(spec.sot, spec.no_timestamps))
    gc.suppress_tokens = sorted(suppressed)
    gc.begin_suppress_tokens = [32, spec.eot]  # " " is byte 32
    return hf, eng, suppressed


def _features(seconds: float, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * seconds)) / 16000.0
    # structured pseudo-speech: AM harmonics + noise bursts, so windows
    # produce varied (non-degenerate) token patterns
    audio = (
        0.2 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3.1 * t))
        + 0.1 * np.sin(2 * np.pi * 431 * t) * (t % 7 < 3.5)
        + 0.05 * rng.standard_normal(len(t))
    ).astype(np.float32)
    return mel_ops.log_mel_full(audio)  # [T, 80]


def _run_ours(eng, feats, suppressed):
    opts = TranscribeOptions(
        language="en",
        temperatures=(0.0,),
        log_prob_threshold=None,
        no_speech_threshold=None,
        compression_ratio_threshold=None,
        condition_on_previous_text=False,
        suppress_tokens=suppressed,
        suppress_blank=True,
    )
    segments, lang, _, _ = generate_segments(eng, feats, opts)
    assert lang == "en"
    return segments


def _run_hf(hf, feats, content_frames):
    import torch

    x = torch.from_numpy(np.ascontiguousarray(feats[:content_frames].T))[None]
    with torch.no_grad():
        out = hf.generate(
            input_features=x,
            return_timestamps=True,
            return_segments=True,
            language="en",
            task="transcribe",
            do_sample=False,
            num_beams=1,
            condition_on_prev_tokens=False,
            logprob_threshold=None,
            no_speech_threshold=None,
            compression_ratio_threshold=None,
        )
    return out["segments"][0]


@pytest.mark.parametrize("seconds,seed", [(50.0, 11), (73.0, 12)])
def test_long_form_token_and_boundary_parity(oracle_pair, seconds, seed):
    hf, eng, suppressed = oracle_pair
    spec = eng.tokenizer.spec
    feats = _features(seconds, seed)
    content_frames = feats.shape[0] - 1

    ours = _run_ours(eng, feats, suppressed)
    theirs = _run_hf(hf, feats, content_frames)

    # 1) the greedy TEXT token stream must be identical end to end
    ours_text = [int(t) for s in ours for t in s.tokens if t < spec.eot]
    hf_text = [
        int(t) for s in theirs for t in s["tokens"].tolist() if t < spec.eot
    ]
    assert ours_text == hf_text

    # 2) segment boundaries must match (same timestamp splits, same seeks)
    ours_bounds = [(round(s.start, 2), round(s.end, 2)) for s in ours]
    hf_bounds = [
        (round(float(s["start"]), 2), round(float(s["end"]), 2)) for s in theirs
    ]
    assert ours_bounds == hf_bounds

    # sanity: the loop actually exercised multiple windows
    assert len({s.seek for s in ours}) >= 2, "audio did not span multiple windows"
