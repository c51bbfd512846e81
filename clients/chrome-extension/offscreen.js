// Offscreen document: owns the MediaStream, AudioWorklet and WebSocket
// (MV3 service workers can't hold an AudioContext).

let ws = null;
let ctx = null;
let stream = null;
let uid = null;
let tabId = null;

function makeUid() {
  return crypto.randomUUID ? crypto.randomUUID() : String(Math.random()).slice(2);
}

async function start(streamId, capturedTabId, options) {
  tabId = capturedTabId;
  uid = makeUid();
  stream = await navigator.mediaDevices.getUserMedia({
    audio: {
      mandatory: { chromeMediaSource: "tab", chromeMediaSourceId: streamId },
    },
  });

  const scheme = options.useWss ? "wss" : "ws";
  let url = `${scheme}://${options.host}:${options.port}`;
  if (options.apiKey) url += `?token=${options.apiKey}`;
  ws = new WebSocket(url);
  ws.binaryType = "arraybuffer";

  ws.onopen = () => {
    // handshake: identical schema to the Python client (client.py on_open)
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
      chrome.runtime.sendMessage({ type: "SEGMENTS", tabId, segments: msg.segments });
    }
  };
  ws.onerror = () => stop();

  ctx = new AudioContext();
  await ctx.audioWorklet.addModule("audio-processor.js");
  const src = ctx.createMediaStreamSource(stream);
  const node = new AudioWorkletNode(ctx, "pcm16k-processor");
  node.port.onmessage = (ev) => {
    if (ws && ws.readyState === WebSocket.OPEN) ws.send(ev.data);
  };
  src.connect(node);
  // keep the tab audible while capturing
  src.connect(ctx.destination);
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

chrome.runtime.onMessage.addListener((msg) => {
  if (msg.type === "OFFSCREEN_START") start(msg.streamId, msg.tabId, msg.options);
  else if (msg.type === "OFFSCREEN_STOP") stop();
});
