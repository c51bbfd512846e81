// Firefox background page: owns capture + WebSocket (no offscreen doc
// needed — MV2 background pages can hold an AudioContext).

let ws = null;
let ctx = null;
let stream = null;
let uid = null;
let capturedTabId = null;

function makeUid() {
  return crypto.randomUUID ? crypto.randomUUID() : String(Math.random()).slice(2);
}

async function start(tabId) {
  capturedTabId = tabId;
  uid = makeUid();
  const options = await browser.storage.sync.get({
    host: "localhost",
    port: 9090,
    language: null,
    task: "transcribe",
    model: "small",
    useVad: true,
    apiKey: null,
  });

  stream = await navigator.mediaDevices.getUserMedia({ audio: true });

  let url = `ws://${options.host}:${options.port}`;
  if (options.apiKey) url += `?token=${options.apiKey}`;
  ws = new WebSocket(url);
  ws.binaryType = "arraybuffer";
  ws.onopen = () => {
    ws.send(
      JSON.stringify({
        uid,
        language: options.language || null,
        task: options.task || "transcribe",
        model: options.model || "small",
        use_vad: options.useVad !== false,
      })
    );
  };
  ws.onmessage = (ev) => {
    const msg = JSON.parse(ev.data);
    if (msg.uid !== uid) return;
    if (msg.segments) {
      browser.tabs.sendMessage(capturedTabId, {
        type: "SHOW_CAPTIONS",
        segments: msg.segments,
      });
    }
  };

  ctx = new AudioContext();
  const src = ctx.createMediaStreamSource(stream);
  const proc = ctx.createScriptProcessor(4096, 1, 1);
  const ratio = ctx.sampleRate / 16000;
  let phase = 0; // block-relative, may sit in [-1, 0) at a seam
  let prev = 0; // last sample of the previous block (seam interpolation)
  proc.onaudioprocess = (e) => {
    const input = e.inputBuffer.getChannelData(0);
    const n = input.length;
    // resample over [prev | input]: at non-integer ratios (44.1 kHz) the
    // phase crosses block boundaries mid-interval — interpolate the seam
    // against the carried last sample instead of reading input[-1]
    const ext = new Float32Array(n + 1);
    ext[0] = prev;
    ext.set(input, 1);
    const out = [];
    let ep = phase + 1;
    while (ep < n) {
      const i = Math.floor(ep);
      const frac = ep - i;
      out.push(ext[i] * (1 - frac) + ext[i + 1] * frac);
      ep += ratio;
    }
    phase = ep - 1 - n;
    prev = input[n - 1];
    if (ws && ws.readyState === WebSocket.OPEN && out.length) {
      ws.send(Float32Array.from(out).buffer);
    }
  };
  src.connect(proc);
  proc.connect(ctx.destination);
}

function stop() {
  if (ws && ws.readyState === WebSocket.OPEN) {
    ws.send(new TextEncoder().encode("END_OF_AUDIO"));
    ws.close();
  }
  ws = null;
  if (ctx) ctx.close();
  ctx = null;
  if (stream) stream.getTracks().forEach((t) => t.stop());
  stream = null;
}

browser.runtime.onMessage.addListener((msg, sender, sendResponse) => {
  if (msg.type === "START_CAPTURE") {
    start(msg.tabId);
    sendResponse({ ok: true });
  } else if (msg.type === "STOP_CAPTURE") {
    stop();
    sendResponse({ ok: true });
  } else if (msg.type === "GET_STATE") {
    sendResponse({ capturing: !!ws });
  }
  return true;
});
