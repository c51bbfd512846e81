#!/usr/bin/env python
"""Train the in-repo streaming VAD (audio/vad_model.py) on synthetic audio.

Positives: harmonic stacks (f0 80-320 Hz) shaped by 2-3 formant resonances
with syllabic (2-8 Hz) amplitude modulation — the spectro-temporal signature
of speech. Negatives: white/pink noise, stationary tones and chords, chirps,
click trains, silence — all RMS-matched to the positives so energy alone
cannot separate the classes.

    python scripts/train_vad.py --steps 800 --out whisperlive_tpu/audio/vad_weights.npz
"""

import argparse

import numpy as np

from whisperlive_tpu.audio.vad_model import (
    N_FEATS,
    WINDOW,
    extract_features,
    gru_forward_jax,
    init_vad_params,
)

SR = 16000
CLIP_WINDOWS = 50  # 1.6 s
CLIP = CLIP_WINDOWS * WINDOW


def synth_speechlike(rng) -> tuple[np.ndarray, np.ndarray]:
    """Speech-like clip + per-window voicing labels."""
    t = np.arange(CLIP) / SR
    f0 = rng.uniform(80, 320)
    jitter = 1.0 + 0.03 * np.cumsum(rng.standard_normal(CLIP)) / np.sqrt(CLIP)
    sig = np.zeros(CLIP)
    n_harm = rng.integers(6, 16)
    decay = rng.uniform(0.5, 1.5)
    use_jitter = rng.random() < 0.7
    for k in range(1, n_harm):
        ph = t * jitter if use_jitter else t
        sig += rng.uniform(0.2, 1.0) / (k**decay) * np.sin(2 * np.pi * f0 * k * ph)
    # formant shaping most of the time; some voices stay plain-harmonic so
    # the model keys on harmonicity + syllabic AM, not the formant envelope
    if rng.random() < 0.7:
        spec = np.fft.rfft(sig)
        freqs = np.fft.rfftfreq(CLIP, 1 / SR)
        envelope = np.full_like(freqs, 0.05)
        for _ in range(rng.integers(2, 4)):
            fc = rng.uniform(300, 3200)
            bw = rng.uniform(80, 300)
            envelope += np.exp(-0.5 * ((freqs - fc) / bw) ** 2)
        sig = np.fft.irfft(spec * envelope, n=CLIP)
    # syllabic modulation with real pauses
    am_rate = rng.uniform(2, 8)
    am = 0.5 * (1 + np.sin(2 * np.pi * am_rate * t + rng.uniform(0, 6.28)))
    am = am ** rng.uniform(1.0, 2.5)
    gate = (am > 0.15).astype(np.float64)
    sig = sig * am * gate
    sig = sig / (np.abs(sig).max() + 1e-9) * rng.uniform(0.05, 0.5)
    # per-window label: enough modulated energy in the window
    w_env = (am * gate).reshape(CLIP_WINDOWS, WINDOW).mean(axis=1)
    labels = (w_env > 0.1).astype(np.float32)
    if rng.random() < 0.7:  # additive noise at varied SNR
        sig = sig + rng.standard_normal(CLIP) * rng.uniform(0.002, 0.05) * sig.std() * 10
    return sig.astype(np.float32), labels


def synth_nonspeech(rng) -> tuple[np.ndarray, np.ndarray]:
    t = np.arange(CLIP) / SR
    kind = rng.integers(0, 6)
    if kind == 0:  # white noise
        sig = rng.standard_normal(CLIP)
    elif kind == 1:  # pink-ish noise
        spec = np.fft.rfft(rng.standard_normal(CLIP))
        spec /= np.maximum(np.fft.rfftfreq(CLIP, 1 / SR), 20) ** rng.uniform(0.4, 1.0)
        sig = np.fft.irfft(spec, n=CLIP)
    elif kind == 2:  # stationary tone/chord (no syllabic AM)
        sig = np.zeros(CLIP)
        for _ in range(rng.integers(1, 4)):
            sig += np.sin(2 * np.pi * rng.uniform(100, 3000) * t + rng.uniform(0, 6))
    elif kind == 3:  # slow chirp
        f = np.linspace(rng.uniform(100, 500), rng.uniform(800, 4000), CLIP)
        sig = np.sin(2 * np.pi * np.cumsum(f) / SR)
    elif kind == 4:  # click train
        sig = np.zeros(CLIP)
        sig[:: rng.integers(400, 4000)] = 1.0
        sig = np.convolve(sig, np.hanning(64), mode="same")
    else:  # near-silence
        sig = rng.standard_normal(CLIP) * 1e-4
    amp = rng.uniform(0.05, 0.5) if kind != 5 else 1.0
    sig = sig / (np.abs(sig).max() + 1e-9) * amp
    return sig.astype(np.float32), np.zeros(CLIP_WINDOWS, np.float32)


def make_batch(rng, b):
    feats = np.zeros((b, CLIP_WINDOWS, N_FEATS), np.float32)
    labels = np.zeros((b, CLIP_WINDOWS), np.float32)
    for i in range(b):
        sig, lab = synth_speechlike(rng) if i % 2 == 0 else synth_nonspeech(rng)
        feats[i] = extract_features(sig)
        labels[i] = lab
    return feats, labels


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=800)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--lr", type=float, default=3e-3)
    parser.add_argument("--out", type=str,
                        default="whisperlive_tpu/audio/vad_weights.npz")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_platforms", "cpu")  # tiny model: CPU is fine

    rng = np.random.default_rng(args.seed)
    params = {k: jnp.asarray(v) for k, v in init_vad_params(args.seed).items()}
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def loss_fn(p, feats, labels):
        _, logits = gru_forward_jax(p, feats)
        return optax.sigmoid_binary_cross_entropy(logits, labels).mean()

    @jax.jit
    def step(p, o, feats, labels):
        loss, grads = jax.value_and_grad(loss_fn)(p, feats, labels)
        updates, o = opt.update(grads, o)
        return optax.apply_updates(p, updates), o, loss

    for i in range(args.steps):
        feats, labels = make_batch(rng, args.batch)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(feats),
                                       jnp.asarray(labels))
        if i % 100 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(loss):.4f}")

    # held-out eval
    feats, labels = make_batch(np.random.default_rng(args.seed + 999), 128)
    probs, _ = gru_forward_jax(params, jnp.asarray(feats))
    acc = float(((np.asarray(probs) > 0.5) == (labels > 0.5)).mean())
    print(f"held-out window accuracy: {acc:.3f}")

    np.savez(args.out, **{k: np.asarray(v) for k, v in params.items()})
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
