"""Translation worker: queue draining, wire format, error isolation."""

import asyncio

import pytest

from whisperlive_tpu.translation import (
    IdentityTranslator,
    TranslationWorker,
    make_translator,
)


class UpperTranslator:
    def translate(self, text, target_language):
        return f"[{target_language}] {text.upper()}"


class BoomTranslator:
    def translate(self, text, target_language):
        raise RuntimeError("model exploded")


class FakeClient:
    uid = "u1"

    def __init__(self):
        self.sent = []

    async def send(self, payload):
        self.sent.append(payload)


def run(coro):
    return asyncio.run(coro)


def test_identity_fallback_when_no_model():
    t = make_translator(None)
    assert isinstance(t, IdentityTranslator)
    assert t.translate("bonjour", "en") == "bonjour"


def test_worker_translates_and_sends():
    async def main():
        client = FakeClient()
        w = TranslationWorker(client, "de", UpperTranslator())
        w.queue.put({"start": "0.000", "end": "1.000", "text": "hello", "completed": True})
        w.poke()
        for _ in range(100):
            if client.sent:
                break
            await asyncio.sleep(0.02)
        await w.stop()
        return client.sent

    sent = run(main())
    assert sent, "nothing sent"
    msg = sent[0]
    assert msg["uid"] == "u1"
    segs = msg["translated_segments"]
    assert segs[0]["text"] == "[de] HELLO"
    assert segs[0]["start"] == "0.000"  # original timing preserved


def test_worker_survives_translator_error():
    async def main():
        client = FakeClient()
        w = TranslationWorker(client, "fr", BoomTranslator())
        w.queue.put({"start": "0.000", "end": "1.000", "text": "hi", "completed": True})
        w.poke()
        for _ in range(100):
            if client.sent:
                break
            await asyncio.sleep(0.02)
        await w.stop()
        return client.sent

    sent = run(main())
    # error isolated: original text passes through
    assert sent and sent[0]["translated_segments"][0]["text"] == "hi"


def test_worker_batches_queue():
    async def main():
        client = FakeClient()
        w = TranslationWorker(client, "es", UpperTranslator())
        for i in range(5):
            w.queue.put({"start": f"{i}.000", "end": f"{i+1}.000", "text": f"s{i}", "completed": True})
        w.poke()
        for _ in range(150):
            total = sum(len(m["translated_segments"]) for m in client.sent)
            if total == 5:
                break
            await asyncio.sleep(0.02)
        await w.stop()
        return client.sent

    sent = run(main())
    texts = [s["text"] for m in sent for s in m["translated_segments"]]
    assert texts == [f"[es] S{i}" for i in range(5)]
