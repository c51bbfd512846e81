"""WeSpeaker-ResNet-shaped speaker embedder (audio/wespeaker.py): graph
parity (numpy eval vs jax train-infra), ONNX ingestion of a torch-style
export, and verification quality of the shipped LITE weights — the
reference's embedding-model family (whisper_live/diarization.py:52-62,
pyannote wespeaker-voxceleb-resnet34-LM), rebuilt for zero-egress."""

import os
import sys

import numpy as np
import pytest

from whisperlive_tpu.audio import wespeaker as ws

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _rand_params(seed, cfg=ws.LITE):
    rng = np.random.default_rng(seed)
    p = ws.init_wespeaker_params(cfg, seed)
    # perturb BN stats/affines so eval-mode parity is meaningful
    for k in list(p):
        if k.endswith("_m"):
            p[k] = (rng.standard_normal(p[k].shape) * 0.1).astype(np.float32)
        elif k.endswith("_v"):
            p[k] = (1 + 0.3 * rng.random(p[k].shape)).astype(np.float32)
        elif k.endswith("_g") or k.endswith("_b") and p[k].ndim == 1:
            p[k] = (1 + 0.1 * rng.standard_normal(p[k].shape)).astype(np.float32)
    return p


def test_config_roundtrip_and_shapes():
    assert ws.config_of(ws.init_wespeaker_params(ws.LITE)) == ws.LITE
    assert ws.R34.channels == (32, 64, 128, 256)
    assert ws.R34.blocks == (3, 4, 6, 3)
    assert ws.R34.emb_dim == 256
    # 80 mel bins through three stride-2 stages -> 10; TSTP doubles
    assert ws.R34.pool_dim == 2 * 256 * 10


def test_np_jax_parity_eval_mode():
    """embed_np (host inference) must match the jax eval-mode forward —
    the training graph and the serving graph are the same function."""
    p = _rand_params(1)
    rng = np.random.default_rng(2)
    # odd frame count exercises the ceil-division downsampling path
    feats = rng.standard_normal((2, 77, 80)).astype(np.float32)
    e_np = np.stack([ws.embed_np(p, f) for f in feats])
    e_jx, stats = ws.embed_jax(p, feats, train=False)
    assert stats == {}
    # f32 accumulation order differs (tensordot vs XLA conv); f64 agrees
    # to 7e-7 — this bound is about catching structural drift
    np.testing.assert_allclose(e_np, np.asarray(e_jx), atol=5e-3)
    assert np.linalg.norm(e_np[0]) == pytest.approx(1.0, abs=1e-4)


def test_train_mode_returns_ema_stats():
    import jax.numpy as jnp

    p = {k: jnp.asarray(v) for k, v in _rand_params(3).items()}
    feats = np.random.default_rng(4).standard_normal((2, 50, 80)).astype(np.float32)
    _, stats = ws.embed_jax(p, jnp.asarray(feats), train=True, ema=0.9)
    assert any(k.endswith("_m") for k in stats)
    assert any(k.endswith("_v") for k in stats)
    # EMA moves stats toward the batch statistics, not to them
    k = "stem_bn_m"
    assert not np.allclose(np.asarray(stats[k]), np.asarray(p[k]))


def test_onnx_roundtrip_torch_export_layout(tmp_path):
    """load_wespeaker_onnx must reconstruct the model from tensors in a
    torch ONNX export's layout and naming (conv [C_out,C_in,kh,kw]; BN as
    weight/bias/running_mean/running_var; linear [out,in]) — the ingestion
    path for a real wespeaker-voxceleb-resnet34-LM export."""
    from conftest import write_onnx_file

    p = _rand_params(5)
    cfg = ws.config_of(p)
    tensors = []

    def emit_bn(torch_name, prefix):
        tensors.append((f"{torch_name}.weight", p[f"{prefix}_g"]))
        tensors.append((f"{torch_name}.bias", p[f"{prefix}_b"]))
        tensors.append((f"{torch_name}.running_mean", p[f"{prefix}_m"]))
        tensors.append((f"{torch_name}.running_var", p[f"{prefix}_v"]))

    def to_onnx_conv(w):
        # TRUE wespeaker export layout: the torch model runs on
        # [B, C, F(height), T(width)], so the ONNX kernel is
        # [C_out, C_in, kh=FREQ, kw=TIME]; ours is [kh=T, kw=F, Ci, Co].
        return np.transpose(w, (3, 2, 1, 0))

    tensors.append(("front.conv1.weight", to_onnx_conv(p["stem_w"])))
    emit_bn("front.bn1", "stem_bn")
    for name, _ci, _co, _st, ds in ws._block_specs(cfg):
        tensors.append((f"front.{name}.conv1.weight", to_onnx_conv(p[f"{name}_c1_w"])))
        emit_bn(f"front.{name}.bn1", f"{name}_bn1")
        tensors.append((f"front.{name}.conv2.weight", to_onnx_conv(p[f"{name}_c2_w"])))
        emit_bn(f"front.{name}.bn2", f"{name}_bn2")
        if ds:
            tensors.append(
                (f"front.{name}.downsample.0.weight", to_onnx_conv(p[f"{name}_ds_w"]))
            )
            emit_bn(f"front.{name}.downsample.1", f"{name}_dsbn")
    # torch Linear [out, in] over wespeaker's CHANNEL-major pooled layout:
    # scatter our freq-major rows to their wespeaker positions first
    perm = ws.pool_permutation(cfg)
    onnx_rows = np.empty_like(p["emb_w"])
    onnx_rows[perm] = p["emb_w"]
    tensors.append(("seg_1.weight", onnx_rows.T))
    tensors.append(("seg_1.bias", p["emb_b"]))

    path = str(tmp_path / "wespeaker.onnx")
    write_onnx_file(path, tensors)
    loaded = ws.load_wespeaker_onnx(path, cfg)
    for k in p:
        np.testing.assert_allclose(loaded[k], p[k], atol=1e-6, err_msg=k)

    # and the ingested model embeds identically
    audio = (np.random.default_rng(6).standard_normal(16000) * 0.1).astype(
        np.float32
    )
    a = ws.WeSpeakerEmbedder(p)(audio)
    b = ws.WeSpeakerEmbedder(loaded)(audio)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_onnx_roundtrip_anonymous_names(tmp_path):
    """Same graph as the torch-layout roundtrip but with STRIPPED
    initializer names (`onnx::Conv_N` / bare numbers, as newer torch
    exporters emit) — ingestion must fall back to pure graph order +
    shape signatures, with BN roles filled in the ONNX
    BatchNormalization input order (scale, B, mean, var)."""
    from conftest import write_onnx_file

    p = _rand_params(7)
    cfg = ws.config_of(p)
    tensors = []
    counter = [0]

    def nm(kind):
        counter[0] += 1
        return (f"onnx::{kind}_{counter[0]}" if counter[0] % 2
                else str(1000 + counter[0]))

    def emit_bn(prefix):
        # ONNX BatchNormalization input order: scale, B, input_mean, input_var
        for role in ("g", "b", "m", "v"):
            tensors.append((nm("BatchNormalization"), p[f"{prefix}_{role}"]))

    def to_onnx_conv(w):
        return np.transpose(w, (3, 2, 1, 0))

    tensors.append((nm("Conv"), to_onnx_conv(p["stem_w"])))
    emit_bn("stem_bn")
    for name, _ci, _co, _st, ds in ws._block_specs(cfg):
        tensors.append((nm("Conv"), to_onnx_conv(p[f"{name}_c1_w"])))
        emit_bn(f"{name}_bn1")
        tensors.append((nm("Conv"), to_onnx_conv(p[f"{name}_c2_w"])))
        emit_bn(f"{name}_bn2")
        if ds:
            tensors.append((nm("Conv"), to_onnx_conv(p[f"{name}_ds_w"])))
            emit_bn(f"{name}_dsbn")
    perm = ws.pool_permutation(cfg)
    onnx_rows = np.empty_like(p["emb_w"])
    onnx_rows[perm] = p["emb_w"]
    tensors.append((nm("MatMul"), onnx_rows.T))
    tensors.append((nm("Add"), p["emb_b"]))

    path = str(tmp_path / "wespeaker_anon.onnx")
    write_onnx_file(path, tensors)
    loaded = ws.load_wespeaker_onnx(path, cfg)
    for k in p:
        np.testing.assert_allclose(loaded[k], p[k], atol=1e-6, err_msg=k)


def test_onnx_wrong_family_raises_with_inventory(tmp_path):
    from conftest import write_onnx_file

    path = str(tmp_path / "bad.onnx")
    write_onnx_file(path, [("x", np.zeros((3, 3), np.float32))])
    with pytest.raises(ValueError, match="inventory"):
        ws.load_wespeaker_onnx(path, ws.LITE)


@pytest.mark.skipif(not ws.weights_available(), reason="weights not shipped")
def test_shipped_weights_verification_quality():
    """Held-out synthetic speakers through mismatched channels: the shipped
    wespeaker-lite weights must separate them clearly (AUC) and beat the
    spectral stand-in — published by scripts/train_speaker.py --arch
    resnet."""
    from train_speaker import evaluate

    data = np.load(ws.WEIGHTS_PATH)
    p = {k: data[k] for k in data.files}
    (auc_l, eer_l), (auc_s, _eer_s) = evaluate(
        p, seed=20260817, n_speakers=12, n_utt=3, channel=True, arch="resnet"
    )
    assert auc_l > 0.93, (auc_l, eer_l)
    assert auc_l > auc_s


@pytest.mark.skipif(not ws.weights_available(), reason="weights not shipped")
def test_quality_default_embedder_selection():
    """quality=True (REST/offline) selects the wespeaker embedder;
    streaming default stays the cheap learned MLP; WL_SPEAKER forces."""
    from whisperlive_tpu.audio.speaker_model import LearnedSpeakerEmbedder
    from whisperlive_tpu.diarization import _default_embedder

    assert isinstance(_default_embedder(quality=True), ws.WeSpeakerEmbedder)
    assert isinstance(_default_embedder(quality=False), LearnedSpeakerEmbedder)
    os.environ["WL_SPEAKER"] = "wespeaker"
    try:
        assert isinstance(_default_embedder(quality=False), ws.WeSpeakerEmbedder)
    finally:
        del os.environ["WL_SPEAKER"]


def test_torch_oracle_parity(tmp_path):
    """Cross-implementation oracle: a REAL torch ResNet running wespeaker's
    semantics ([B, 1, F(height), T(width)] convs, channel-major TSTP,
    Linear head) is exported in torch state_dict layout, ingested by
    load_wespeaker_onnx, and embed_np must reproduce the torch embedding —
    the axis-orientation proof the self-consistent roundtrip can't give."""
    import torch
    import torch.nn as nn

    from conftest import write_onnx_file

    torch.manual_seed(0)
    cfg = ws.LITE

    class Block(nn.Module):
        def __init__(self, c_in, c_out, stride, ds):
            super().__init__()
            self.conv1 = nn.Conv2d(c_in, c_out, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(c_out)
            self.conv2 = nn.Conv2d(c_out, c_out, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(c_out)
            self.ds = (
                nn.Sequential(
                    nn.Conv2d(c_in, c_out, 1, stride, bias=False),
                    nn.BatchNorm2d(c_out),
                )
                if ds
                else None
            )

        def forward(self, x):
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            sc = self.ds(x) if self.ds is not None else x
            return torch.relu(y + sc)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Conv2d(1, cfg.channels[0], 3, 1, 1, bias=False)
            self.stem_bn = nn.BatchNorm2d(cfg.channels[0])
            self.blocks = nn.ModuleList(
                Block(ci, co, st, ds)
                for _name, ci, co, st, ds in ws._block_specs(cfg)
            )
            self.head = nn.Linear(cfg.pool_dim, cfg.emb_dim)

        def forward(self, feats):  # feats [T, 80]
            x = feats.T[None, None]  # [1, 1, F, T] — wespeaker layout
            x = torch.relu(self.stem_bn(self.stem(x)))
            for b in self.blocks:
                x = b(x)
            bsz, c, f, t = x.shape
            flat = x.reshape(bsz, c * f, t)  # CHANNEL-major pooling rows
            pooled = torch.cat([flat.mean(-1), flat.std(-1, unbiased=False)], -1)
            emb = self.head(pooled)[0]
            return emb / emb.norm()

    net = Net().eval()
    # non-trivial BN running stats (fresh BNs have mean=0, var=1)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    # export in the torch-name layout the ingester expects
    tensors = []

    def emit_bn(tname, bn):
        tensors.append((f"{tname}.weight", bn.weight.detach().numpy()))
        tensors.append((f"{tname}.bias", bn.bias.detach().numpy()))
        tensors.append((f"{tname}.running_mean", bn.running_mean.numpy()))
        tensors.append((f"{tname}.running_var", bn.running_var.numpy()))

    tensors.append(("front.conv1.weight", net.stem.weight.detach().numpy()))
    emit_bn("front.bn1", net.stem_bn)
    for (name, *_), blk in zip(ws._block_specs(cfg), net.blocks):
        tensors.append((f"front.{name}.conv1.weight",
                        blk.conv1.weight.detach().numpy()))
        emit_bn(f"front.{name}.bn1", blk.bn1)
        tensors.append((f"front.{name}.conv2.weight",
                        blk.conv2.weight.detach().numpy()))
        emit_bn(f"front.{name}.bn2", blk.bn2)
        if blk.ds is not None:
            tensors.append((f"front.{name}.downsample.0.weight",
                            blk.ds[0].weight.detach().numpy()))
            emit_bn(f"front.{name}.downsample.1", blk.ds[1])
    tensors.append(("seg_1.weight", net.head.weight.detach().numpy()))
    tensors.append(("seg_1.bias", net.head.bias.detach().numpy()))

    path = str(tmp_path / "torch_oracle.onnx")
    write_onnx_file(path, tensors)
    loaded = ws.load_wespeaker_onnx(path, cfg)

    audio = (np.random.default_rng(3).standard_normal(16000) * 0.1).astype(
        np.float32
    )
    feats = ws.fbank(audio)
    with torch.no_grad():
        ref = net(torch.from_numpy(feats)).numpy()
    ours = ws.embed_np(loaded, feats)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)
