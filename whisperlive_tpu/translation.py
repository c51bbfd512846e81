"""Any-to-any text translation of committed segments.

Behavioral port of the reference's translation backend
(whisper_live/backend/translation_backend.py, §2.16): a per-client worker
consumes completed segments from a bounded queue (maxsize 100), translates
them to `target_language`, and pushes `{"translated_segments": [...]}` to
the client.

Differences: the worker is an asyncio task (no thread per client), and the
translation model is pluggable behind `Translator`:

  * `HFTranslator` — an on-disk M2M100/SMALL100 checkpoint via transformers
    (torch CPU), loaded lazily and shared across clients — the reference's
    model, when its weights are available.
  * `IdentityTranslator` — pass-through fallback so the wire contract works
    without model weights (tests, protocol debugging).
"""

from __future__ import annotations

import asyncio
import logging
import os
import queue as queue_mod
import threading
from typing import Optional, Protocol

logger = logging.getLogger(__name__)

QUEUE_MAX = 100  # base.py:41


class Translator(Protocol):
    def translate(self, text: str, target_language: str) -> str: ...


class IdentityTranslator:
    """Pass-through (used when no translation weights are on disk)."""

    def translate(self, text: str, target_language: str) -> str:
        return text


class HFTranslator:
    """M2M100/SMALL100 via transformers+torch CPU from a LOCAL checkpoint
    dir (the reference pulls SMALL100 from the hub at runtime;
    translation_backend.py:56-89)."""

    _lock = threading.Lock()
    _shared: dict[str, "HFTranslator"] = {}

    def __init__(self, model_dir: str):
        import torch  # noqa: F401
        from transformers import M2M100ForConditionalGeneration

        from whisperlive_tpu.small100_tokenizer import load_checkpoint_tokenizer

        self.model = M2M100ForConditionalGeneration.from_pretrained(model_dir)
        self.model.eval()
        # SMALL100 checkpoints need the vendored-equivalent tokenizer (the
        # target-language token rides the SOURCE sequence); AutoTokenizer
        # cannot load them (reference vendors tokenization_small100.py)
        self.tokenizer = load_checkpoint_tokenizer(model_dir)

    @classmethod
    def shared(cls, model_dir: str) -> "HFTranslator":
        with cls._lock:
            if model_dir not in cls._shared:
                cls._shared[model_dir] = cls(model_dir)
            return cls._shared[model_dir]

    def translate(self, text: str, target_language: str) -> str:
        import torch

        from whisperlive_tpu.small100_tokenizer import SMALL100Tokenizer

        tok = self.tokenizer
        if hasattr(tok, "tgt_lang"):
            tok.tgt_lang = target_language
        inputs = tok(text, return_tensors="pt")
        with torch.no_grad():
            kwargs = {}
            # SMALL100 carries the target language in the SOURCE sequence —
            # no forced decoder bos (translation_backend.py:90-93); plain
            # M2M100 forces the target lang token instead
            if hasattr(tok, "get_lang_id") and not isinstance(tok, SMALL100Tokenizer):
                kwargs["forced_bos_token_id"] = tok.get_lang_id(target_language)
            out = self.model.generate(**inputs, max_new_tokens=256, **kwargs)
        return tok.batch_decode(out, skip_special_tokens=True)[0]


class JAXTranslator:
    """M2M100/SMALL100 on the accelerator (models/m2m100.py).

    Loads an on-disk HF checkpoint dir; text tokenization still comes from
    the checkpoint's tokenizer (via transformers). Source lengths are padded
    to buckets so the jitted generate program is reused across segments.
    """

    _lock = threading.Lock()
    _shared: dict[str, "JAXTranslator"] = {}

    SRC_BUCKETS = (16, 32, 64, 128, 256)

    def __init__(self, model_dir: str, max_new: int = 200,
                 beam_size: int | None = None):
        import json
        import os

        import jax
        import jax.numpy as jnp
        import safetensors.numpy

        from whisperlive_tpu.models import m2m100 as m2m

        with open(os.path.join(model_dir, "config.json")) as f:
            self.cfg = m2m.config_from_hf(json.load(f))
        sd = safetensors.numpy.load_file(os.path.join(model_dir, "model.safetensors"))
        on_tpu = jax.default_backend() in ("tpu", "axon")
        self.cfg = self.cfg.replace(dtype=jnp.bfloat16 if on_tpu else jnp.float32)
        params = m2m.params_from_state_dict(sd, self.cfg)
        if on_tpu:
            params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        self.params = params
        from whisperlive_tpu.small100_tokenizer import (
            SMALL100Tokenizer,
            load_checkpoint_tokenizer,
        )

        self.tokenizer = load_checkpoint_tokenizer(model_dir)
        self.is_small100 = isinstance(self.tokenizer, SMALL100Tokenizer)
        self.max_new = max_new
        # The reference translates with M2M100's generation-config
        # defaults — beam 5 with early stopping (translation_backend.py
        # calls bare generate()) — so beam is the parity default here;
        # WL_TRANSLATE_BEAM=1 restores greedy for latency-constrained
        # deployments. generate_beam is HF-parity-tested token-for-token.
        if beam_size is None:
            beam_size = int(os.environ.get("WL_TRANSLATE_BEAM", "5"))
        self.beam_size = max(beam_size, 1)

        def gen(p, src, bos):
            if self.beam_size > 1:
                return m2m.generate_beam(
                    p, self.cfg, src, bos, max_new=max_new,
                    beam_size=self.beam_size,
                )
            return m2m.generate_greedy(p, self.cfg, src, bos, max_new=max_new)

        if self.is_small100:
            # SMALL100: no forced decoder bos — the target language token
            # is part of the SOURCE sequence
            self._generate = jax.jit(lambda p, src: gen(p, src, None))
        else:
            self._generate = jax.jit(gen)
        self._lang_lock = threading.Lock()

    @classmethod
    def shared(cls, model_dir: str) -> "JAXTranslator":
        with cls._lock:
            if model_dir not in cls._shared:
                cls._shared[model_dir] = cls(model_dir)
            return cls._shared[model_dir]

    def _lang_id(self, code: str) -> int:
        tok = self.tokenizer
        if hasattr(tok, "get_lang_id"):
            return tok.get_lang_id(code)
        return tok.convert_tokens_to_ids(f"__{code}__")

    def translate(self, text: str, target_language: str) -> str:
        import numpy as np

        import jax.numpy as jnp

        tok = self.tokenizer
        if self.is_small100:
            with self._lang_lock:
                tok.tgt_lang = target_language
                ids = tok.encode(text)
        else:
            enc = tok(text)
            ids = enc["input_ids"] if isinstance(enc, dict) else enc.input_ids
        bucket = next(
            (b for b in self.SRC_BUCKETS if len(ids) <= b), self.SRC_BUCKETS[-1]
        )
        src = np.full((1, bucket), self.cfg.pad_token_id, np.int32)
        src[0, : min(len(ids), bucket)] = ids[:bucket]
        if self.is_small100:
            out = np.asarray(self._generate(self.params, jnp.asarray(src)))[0]
        else:
            out = np.asarray(
                self._generate(
                    self.params, jnp.asarray(src),
                    jnp.asarray([self._lang_id(target_language)], jnp.int32),
                )
            )[0]
        eos = np.where(out == self.cfg.eos_token_id)[0]
        if len(eos):
            out = out[: eos[0]]
        return self.tokenizer.decode(
            [int(t) for t in out], skip_special_tokens=True
        )


def make_translator(
    model_dir: Optional[str] = None, prefer_jax: bool = True
) -> Translator:
    if model_dir:
        if prefer_jax:
            try:
                return JAXTranslator.shared(model_dir)
            except Exception:
                logger.exception(
                    "JAX translator failed to load from %s; trying torch", model_dir
                )
        try:
            return HFTranslator.shared(model_dir)
        except Exception:
            logger.exception("failed to load translation model from %s", model_dir)
    logger.warning(
        "no translation model available — translated_segments will pass "
        "through untranslated"
    )
    return IdentityTranslator()


class TranslationWorker:
    """Per-client async worker: drains the session's translation queue,
    translates in a thread executor (model inference must not block the
    event loop), sends results (translation_backend.py:120-177)."""

    def __init__(
        self,
        client,  # ServeClient: needs .send(payload) and .uid
        target_language: str,
        translator: Translator,
        send_original: bool = False,
    ):
        self.client = client
        self.target_language = target_language or "fr"
        self.translator = translator
        self.send_original = send_original
        self.queue: "queue_mod.Queue[dict]" = queue_mod.Queue(maxsize=QUEUE_MAX)
        self._stop = False
        self._task = asyncio.get_running_loop().create_task(self._run())
        self._wake = asyncio.Event()

    def poke(self) -> None:
        self._wake.set()

    async def stop(self) -> None:
        self._stop = True
        self._wake.set()
        try:
            await asyncio.wait_for(self._task, timeout=5)
        except Exception:
            self._task.cancel()

    async def _run(self) -> None:
        loop = asyncio.get_running_loop()
        while not self._stop:
            batch: list[dict] = []
            while True:
                try:
                    batch.append(self.queue.get_nowait())
                except queue_mod.Empty:
                    break
            if not batch:
                self._wake.clear()
                try:
                    await asyncio.wait_for(self._wake.wait(), timeout=0.5)
                except asyncio.TimeoutError:
                    pass
                continue
            translated = []
            for seg in batch:
                try:
                    text = await loop.run_in_executor(
                        None,
                        self.translator.translate,
                        seg["text"],
                        self.target_language,
                    )
                except Exception:
                    logger.exception("translation failed")
                    text = seg["text"]
                out = dict(seg)
                out["text"] = text
                if self.send_original:
                    out["original_text"] = seg["text"]
                translated.append(out)
            if translated:
                await self.client.send(
                    {"uid": self.client.uid, "translated_segments": translated}
                )
