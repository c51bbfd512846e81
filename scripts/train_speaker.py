#!/usr/bin/env python
"""Train the in-repo speaker embedder (audio/speaker_model.py) on synthetic
voices.

A synthetic SPEAKER is a fixed latent profile: fundamental frequency,
formant center frequencies/bandwidths, spectral tilt, jitter and vibrato
amounts. UTTERANCES from one speaker vary the syllabic modulation pattern,
phrase gating, small f0 drift and additive noise — so the only stable
signal across a speaker's utterances is vocal timbre, which is exactly
what the embedding must capture (and what the reference gets from
pyannote, whisper_live/diarization.py:79-124).

Training: softmax classification over N synthetic speakers on the
L2-normalized embedding (scaled logits), then the classifier head is
dropped. Eval: same/different-speaker cosine ROC AUC on HELD-OUT speaker
profiles, learned vs the weight-free spectral stand-in.

    python scripts/train_speaker.py --steps 1200 \
        --out whisperlive_tpu/audio/speaker_weights.npz
"""

import argparse

import numpy as np

from whisperlive_tpu.audio.speaker_model import (
    EMB_DIM,
    N_BANDS,
    embed_jax,
    extract_features,
    init_speaker_params,
)

SR = 16000
CLIP_S = 1.6
CLIP = int(CLIP_S * SR)
FRAMES = 120  # fixed feature length for batched training


def make_profile(rng) -> dict:
    return {
        "f0": rng.uniform(85, 300),
        "formants": [
            (rng.uniform(300, 900), rng.uniform(60, 160)),
            (rng.uniform(900, 2200), rng.uniform(80, 220)),
            (rng.uniform(2200, 3400), rng.uniform(120, 320)),
        ],
        "tilt": rng.uniform(0.6, 1.6),
        "jitter": rng.uniform(0.005, 0.03),
        "vibrato": rng.uniform(0.0, 0.01),
        "breath": rng.uniform(0.005, 0.06),
    }


def synth_utterance(rng, prof: dict) -> np.ndarray:
    t = np.arange(CLIP) / SR
    f0 = prof["f0"] * rng.uniform(0.96, 1.04)  # small intra-speaker drift
    jit = 1.0 + prof["jitter"] * np.cumsum(rng.standard_normal(CLIP)) / np.sqrt(CLIP)
    vib = 1.0 + prof["vibrato"] * np.sin(2 * np.pi * rng.uniform(4, 6) * t)
    sig = np.zeros(CLIP)
    for k in range(1, 14):
        sig += (1.0 / k ** prof["tilt"]) * np.sin(2 * np.pi * f0 * k * t * jit * vib)
    # speaker-fixed formant envelope (small per-utterance wobble)
    spec = np.fft.rfft(sig)
    freqs = np.fft.rfftfreq(CLIP, 1 / SR)
    envelope = np.full_like(freqs, 0.03)
    for fc, bw in prof["formants"]:
        fc_u = fc * rng.uniform(0.97, 1.03)
        envelope += np.exp(-0.5 * ((freqs - fc_u) / bw) ** 2)
    sig = np.fft.irfft(spec * envelope, n=CLIP)
    # utterance-specific syllabic AM + pauses
    am = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(2.5, 7) * t + rng.uniform(0, 6.3)))
    am = am ** rng.uniform(1.0, 2.0)
    sig = sig * (0.25 + 0.75 * am)
    sig = sig + prof["breath"] * rng.standard_normal(CLIP) * np.abs(sig).std() * 3
    sig = sig / (np.abs(sig).max() + 1e-9) * rng.uniform(0.08, 0.4)
    return sig.astype(np.float32)


def apply_channel(rng, sig: np.ndarray) -> np.ndarray:
    """Utterance-level nuisances the embedding must IGNORE: room reverb,
    additive noise at varied SNR, and channel EQ (mic/telephone coloring).
    Real speaker verification is dominated by channel mismatch, not voice
    similarity — training with per-utterance channels forces the embedder
    onto the speaker traits (f0, formants, tilt) instead of the recording."""
    out = sig.astype(np.float64)
    if rng.random() < 0.5:  # room
        rt = rng.uniform(0.05, 0.35)
        n = int(rt * SR)
        rir = rng.standard_normal(n) * np.exp(-np.arange(n) / (rt * SR / 6.9))
        rir[0] = 1.0
        out = np.convolve(out, rir)[: len(sig)]
    if rng.random() < 0.7:  # noise
        snr_db = rng.uniform(5, 30)
        noise = rng.standard_normal(len(out))
        if rng.random() < 0.5:  # pink-ish
            spec = np.fft.rfft(noise)
            spec /= np.maximum(np.fft.rfftfreq(len(out), 1 / SR), 20) ** 0.5
            noise = np.fft.irfft(spec, n=len(out))
        g = out.std() / (noise.std() + 1e-9) * 10 ** (-snr_db / 20)
        out = out + g * noise
    if rng.random() < 0.5:  # channel EQ: random spectral tilt / bandpass
        spec = np.fft.rfft(out)
        freqs = np.fft.rfftfreq(len(out), 1 / SR)
        tilt = (np.maximum(freqs, 50) / 1000.0) ** rng.uniform(-0.4, 0.4)
        if rng.random() < 0.3:  # telephone-ish band
            tilt = tilt * (freqs > 250) * (freqs < 3600)
        out = np.fft.irfft(spec * tilt, n=len(out))
    out = out / (np.abs(out).max() + 1e-9) * rng.uniform(0.08, 0.4)
    return out.astype(np.float32)


def feats_fixed(audio: np.ndarray) -> np.ndarray:
    f = extract_features(audio)
    if f.shape[0] >= FRAMES:
        return f[:FRAMES]
    return np.pad(f, [(0, FRAMES - f.shape[0]), (0, 0)])


def feats_fbank_fixed(audio: np.ndarray, frames: int = 158) -> np.ndarray:
    from whisperlive_tpu.audio.wespeaker import fbank

    f = fbank(audio)
    if f.shape[0] >= frames:
        return f[:frames]
    return np.pad(f, [(0, frames - f.shape[0]), (0, 0)])


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--arch", choices=("mlp", "resnet"), default="mlp",
                        help="mlp: audio/speaker_model.py; resnet: the "
                             "WeSpeaker-ResNet-shaped graph "
                             "(audio/wespeaker.py, LITE config)")
    parser.add_argument("--steps", type=int, default=1200)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--n_speakers", type=int, default=256)
    parser.add_argument("--lr", type=float, default=2e-3)
    parser.add_argument("--scale", type=float, default=12.0,
                        help="cosine-logit scale for the softmax head")
    parser.add_argument("--margin", type=float, default=0.2,
                        help="additive angular margin on the target cosine "
                             "(AAM-softmax, the standard speaker-"
                             "verification objective) — 0 disables")
    parser.add_argument("--no_channel", action="store_true",
                        help="disable per-utterance reverb/noise/EQ "
                             "augmentation")
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    out = args.out or (
        "whisperlive_tpu/audio/wespeaker_weights.npz"
        if args.arch == "resnet"
        else "whisperlive_tpu/audio/speaker_weights.npz"
    )

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(args.seed)
    profiles = [make_profile(rng) for _ in range(args.n_speakers)]
    if args.arch == "resnet":
        from whisperlive_tpu.audio.wespeaker import (
            LITE,
            embed_jax as ws_embed_jax,
            init_wespeaker_params,
        )

        base = init_wespeaker_params(LITE, args.seed)
        lim = np.sqrt(6.0 / (LITE.emb_dim + args.n_speakers))
        base["wc"] = np.random.default_rng(args.seed + 1).uniform(
            -lim, lim, (LITE.emb_dim, args.n_speakers)
        ).astype(np.float32)
        params = {k: jnp.asarray(v) for k, v in base.items()}

        def forward(p, feats):
            return ws_embed_jax(p, feats, train=True)

        featurize = feats_fbank_fixed
    else:
        params = {
            k: jnp.asarray(v)
            for k, v in init_speaker_params(args.seed, args.n_speakers).items()
        }

        def forward(p, feats):
            return embed_jax(p, feats), {}

        featurize = feats_fixed
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    scale = args.scale

    margin = args.margin

    def loss_fn(p, feats, labels):
        emb, bn_stats = forward(p, feats)  # [B, E] normalized
        wc = p["wc"] / (jnp.linalg.norm(p["wc"], axis=0, keepdims=True) + 1e-8)
        cos = emb @ wc
        # AAM: subtract the margin from the TARGET class cosine only, so
        # same-speaker embeddings must clear other speakers by >= margin
        onehot = jax.nn.one_hot(labels, cos.shape[1], dtype=cos.dtype)
        logits = scale * (cos - margin * onehot)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        return loss, bn_stats

    @jax.jit
    def step(p, o, feats, labels):
        (loss, bn_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, feats, labels
        )
        updates, o = opt.update(grads, o)
        p = optax.apply_updates(p, updates)
        # BN running stats are EMA-tracked, not optimized
        p = {**p, **bn_stats}
        return p, o, loss

    for i in range(args.steps):
        labels = rng.integers(0, args.n_speakers, args.batch)
        utts = [synth_utterance(rng, profiles[l]) for l in labels]
        if not args.no_channel:
            utts = [apply_channel(rng, u) for u in utts]
        feats = np.stack([featurize(u) for u in utts])
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(feats), jnp.asarray(labels)
        )
        if i % 100 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(loss):.4f}", flush=True)

    np_params = {k: np.asarray(v) for k, v in params.items()}
    np_params.pop("wc", None)  # classifier head is training-only
    (auc_l, eer_l), (auc_s, eer_s) = evaluate(
        np_params, seed=args.seed + 7777, channel=not args.no_channel,
        arch=args.arch,
    )
    print(
        f"held-out verification (channel-mismatched): learned AUC {auc_l:.3f}"
        f" EER {eer_l * 100:.1f}% vs spectral AUC {auc_s:.3f}"
        f" EER {eer_s * 100:.1f}%"
    )
    np.savez(out, **np_params)
    print(f"saved {out}")


def evaluate(np_params: dict, seed: int, n_speakers: int = 24, n_utt: int = 4,
             channel: bool = True, arch: str = "mlp"):
    """Same/diff-speaker cosine verification on held-out profiles, each
    utterance through an independent random channel (the real-world test:
    verification must survive recording mismatch). Returns
    ((auc, eer), (auc, eer)) for the learned and spectral embedders."""
    from whisperlive_tpu.audio.speaker_model import LearnedSpeakerEmbedder
    from whisperlive_tpu.diarization import SpectralEmbedder

    rng = np.random.default_rng(seed)
    profs = [make_profile(rng) for _ in range(n_speakers)]
    if arch == "resnet":
        from whisperlive_tpu.audio.wespeaker import WeSpeakerEmbedder

        learned = WeSpeakerEmbedder(np_params)
    else:
        learned = LearnedSpeakerEmbedder(np_params)
    spectral = SpectralEmbedder()
    embs_l, embs_s, who = [], [], []
    for si, p in enumerate(profs):
        for _ in range(n_utt):
            a = synth_utterance(rng, p)
            if channel:
                a = apply_channel(rng, a)
            embs_l.append(learned(a))
            embs_s.append(spectral(a))
            who.append(si)
    who = np.asarray(who)

    def auc_eer(embs):
        embs = np.stack(embs)
        sims, labels = [], []
        n = len(embs)
        for i in range(n):
            for j in range(i + 1, n):
                sims.append(float(embs[i] @ embs[j]))
                labels.append(1.0 if who[i] == who[j] else 0.0)
        sims = np.asarray(sims)
        labels = np.asarray(labels)
        order = np.argsort(sims, kind="mergesort")
        ranks = np.empty(len(sims))
        ranks[order] = np.arange(1, len(sims) + 1)
        pos = labels > 0.5
        n_pos, n_neg = int(pos.sum()), int((~pos).sum())
        auc = float(
            (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
        )
        # EER: threshold where false-accept rate == false-reject rate
        desc = np.argsort(-sims, kind="mergesort")
        lab = labels[desc]
        fa = np.cumsum(1 - lab) / max(n_neg, 1)  # accepted impostors
        fr = 1.0 - np.cumsum(lab) / max(n_pos, 1)  # rejected targets
        k = int(np.argmin(np.abs(fa - fr)))
        eer = float((fa[k] + fr[k]) / 2)
        return auc, eer

    return auc_eer(embs_l), auc_eer(embs_s)


if __name__ == "__main__":
    main()
