'use strict';

// Jest + jsdom suite for the MV3 extension, mirroring the reference
// extension's test approach (hand-rolled chrome API mock, DOM fixtures).
// The wire-protocol assertions validate against the SHARED fixture
// clients/protocol_fixture.json — the Python client tests check the same
// file, so JS and Python cannot drift on message shapes.

const { TextEncoder, TextDecoder } = require('util');
global.TextEncoder = global.TextEncoder || TextEncoder;
global.TextDecoder = global.TextDecoder || TextDecoder;

const protocol = require('../../protocol_fixture.json');

// ---------------------------------------------------------------------------
// Chrome API mock (defined before any extension script loads)
// ---------------------------------------------------------------------------

const storageData = {};

function makeChromeMock() {
  return {
    storage: {
      sync: {
        // options.js uses the callback form, background.js the promise form
        get: jest.fn((defaults, cb) => {
          const result = {};
          Object.keys(defaults).forEach((k) => {
            result[k] = k in storageData ? storageData[k] : defaults[k];
          });
          if (cb) {
            cb(result);
            return undefined;
          }
          return Promise.resolve(result);
        }),
        set: jest.fn((obj, cb) => {
          Object.assign(storageData, obj);
          if (cb) cb();
          return Promise.resolve();
        }),
      },
    },
    runtime: {
      sendMessage: jest.fn(),
      onMessage: { addListener: jest.fn() },
      openOptionsPage: jest.fn(),
      id: 'fake-extension-id',
    },
    tabs: {
      query: jest.fn(),
      sendMessage: jest.fn(),
    },
    tabCapture: {
      getMediaStreamId: jest.fn(async () => 'stream-1'),
    },
    offscreen: {
      hasDocument: jest.fn(async () => false),
      createDocument: jest.fn(async () => {}),
    },
    scripting: {
      executeScript: jest.fn(async () => {}),
    },
  };
}

const flushPromises = () => new Promise((resolve) => setTimeout(resolve, 0));

beforeEach(() => {
  jest.resetModules();
  Object.keys(storageData).forEach((k) => delete storageData[k]);
  global.chrome = makeChromeMock();
  delete window.__wlCaptionsInstalled;
});

// ---------------------------------------------------------------------------
// AudioWorklet resampler (audio-processor.js)
// ---------------------------------------------------------------------------

function loadProcessor(srcRate) {
  let registered = null;
  global.sampleRate = srcRate;
  global.AudioWorkletProcessor = class {
    constructor() {
      this.port = { postMessage: jest.fn() };
    }
  };
  global.registerProcessor = (name, cls) => {
    registered = { name, cls };
  };
  jest.isolateModules(() => {
    require('../audio-processor.js');
  });
  return registered;
}

describe('audio-processor resampler', () => {
  test('registers the pcm16k processor', () => {
    const reg = loadProcessor(48000);
    expect(reg.name).toBe('pcm16k-processor');
  });

  test('48k->16k on a linear ramp is sample-exact (ratio 3)', () => {
    const reg = loadProcessor(48000);
    const proc = new reg.cls();
    const blockIn = 128;
    let v = 0;
    for (let b = 0; b < 120; b++) {
      const chunk = new Float32Array(blockIn);
      for (let i = 0; i < blockIn; i++) chunk[i] = v++;
      proc.process([[chunk]]);
    }
    expect(proc.port.postMessage).toHaveBeenCalled();
    const buf = proc.port.postMessage.mock.calls[0][0];
    const out = new Float32Array(buf);
    expect(out.length).toBeGreaterThanOrEqual(4096);
    // linear interpolation of a linear ramp: out[k] == 3k within fp noise
    for (let k = 0; k < 100; k++) {
      expect(Math.abs(out[k] - 3 * k)).toBeLessThan(1e-3);
    }
  });

  test('mixes multi-channel input down to mono', () => {
    const reg = loadProcessor(16000); // ratio 1: output == mono mixdown
    const proc = new reg.cls();
    const n = 128;
    const left = new Float32Array(n).fill(1.0);
    const right = new Float32Array(n).fill(0.0);
    for (let b = 0; b < 40; b++) proc.process([[left, right]]);
    const out = new Float32Array(proc.port.postMessage.mock.calls[0][0]);
    expect(Math.abs(out[10] - 0.5)).toBeLessThan(1e-6);
  });

  test('44.1 kHz (non-integer ratio) never produces NaN at block seams', () => {
    // regression: the phase can land in [-1, 0) at a block boundary for
    // non-integer ratios; the seam must interpolate against the carried
    // last sample, not read mono[-1]
    const reg = loadProcessor(44100);
    const proc = new reg.cls();
    const blockIn = 128;
    for (let b = 0; b < 1200; b++) {
      const chunk = new Float32Array(blockIn);
      for (let i = 0; i < blockIn; i++) {
        chunk[i] = Math.sin((2 * Math.PI * 440 * (b * blockIn + i)) / 44100);
      }
      proc.process([[chunk]]);
    }
    expect(proc.port.postMessage).toHaveBeenCalled();
    for (const call of proc.port.postMessage.mock.calls) {
      const out = new Float32Array(call[0]);
      for (let k = 0; k < out.length; k++) {
        expect(Number.isNaN(out[k])).toBe(false);
        expect(Math.abs(out[k])).toBeLessThanOrEqual(1.0001);
      }
    }
  });

  test('phase carries across process() calls (no seams)', () => {
    const reg = loadProcessor(48000);
    const procA = new reg.cls();
    const procB = new reg.cls();
    const total = 48000;
    const sig = new Float32Array(total);
    for (let i = 0; i < total; i++) sig[i] = Math.sin((2 * Math.PI * 440 * i) / 48000);
    // A: one big block; B: many 160-sample blocks
    procA.process([[sig]]);
    for (let off = 0; off < total; off += 160) {
      procB.process([[sig.subarray(off, off + 160)]]);
    }
    const a = new Float32Array(procA.port.postMessage.mock.calls[0][0]);
    const b = new Float32Array(procB.port.postMessage.mock.calls[0][0]);
    for (let k = 0; k < 1000; k++) {
      expect(Math.abs(a[k] - b[k])).toBeLessThan(1e-5);
    }
  });
});

// ---------------------------------------------------------------------------
// Offscreen document: WebSocket handshake + teardown (offscreen.js)
// ---------------------------------------------------------------------------

class FakeWebSocket {
  constructor(url) {
    this.url = url;
    this.sent = [];
    this.readyState = FakeWebSocket.OPEN;
    FakeWebSocket.last = this;
  }
  send(d) {
    this.sent.push(d);
  }
  close() {
    this.readyState = FakeWebSocket.CLOSED;
  }
}
FakeWebSocket.OPEN = 1;
FakeWebSocket.CLOSED = 3;

function loadOffscreen() {
  global.WebSocket = FakeWebSocket;
  global.AudioContext = class {
    constructor() {
      this.audioWorklet = { addModule: jest.fn(async () => {}) };
      this.destination = {};
    }
    createMediaStreamSource() {
      return { connect: jest.fn() };
    }
    close() {}
  };
  global.AudioWorkletNode = class {
    constructor() {
      this.port = {};
    }
  };
  Object.defineProperty(global.navigator, 'mediaDevices', {
    value: { getUserMedia: jest.fn(async () => ({ getTracks: () => [] })) },
    configurable: true,
  });
  jest.isolateModules(() => {
    require('../offscreen.js');
  });
  return chrome.runtime.onMessage.addListener.mock.calls[0][0];
}

async function startOffscreen(listener, options) {
  listener({
    type: 'OFFSCREEN_START',
    streamId: 's1',
    tabId: 7,
    options: Object.assign(
      { host: 'example.test', port: 9090, task: 'transcribe', model: 'small' },
      options || {}
    ),
  });
  await flushPromises();
  const ws = FakeWebSocket.last;
  ws.onopen();
  return ws;
}

describe('offscreen WebSocket protocol', () => {
  test('handshake carries every required protocol field', async () => {
    const listener = loadOffscreen();
    const ws = await startOffscreen(listener);
    const handshake = JSON.parse(ws.sent[0]);
    for (const key of protocol.handshake_required) {
      expect(Object.keys(handshake)).toContain(key);
    }
    expect(protocol.task_values).toContain(handshake.task);
  });

  test('handshake sends no unknown fields', async () => {
    const listener = loadOffscreen();
    const ws = await startOffscreen(listener);
    const handshake = JSON.parse(ws.sent[0]);
    const allowed = protocol.handshake_required.concat(
      protocol.handshake_optional
    );
    for (const key of Object.keys(handshake)) {
      expect(allowed).toContain(key);
    }
  });

  test('ws URL uses the configured host/port and api key token', async () => {
    const listener = loadOffscreen();
    const ws = await startOffscreen(listener, { apiKey: 'sekret' });
    expect(ws.url).toBe('ws://example.test:9090?token=sekret');
  });

  test('segments for our uid are forwarded, others ignored', async () => {
    const listener = loadOffscreen();
    const ws = await startOffscreen(listener);
    const uid = JSON.parse(ws.sent[0]).uid;
    ws.onmessage({
      data: JSON.stringify({ uid, segments: [protocol.example_segment] }),
    });
    expect(chrome.runtime.sendMessage).toHaveBeenCalledWith(
      expect.objectContaining({ type: 'SEGMENTS', tabId: 7 })
    );
    chrome.runtime.sendMessage.mockClear();
    ws.onmessage({
      data: JSON.stringify({ uid: 'someone-else', segments: [] }),
    });
    expect(chrome.runtime.sendMessage).not.toHaveBeenCalled();
  });

  test('stop sends END_OF_AUDIO then closes', async () => {
    const listener = loadOffscreen();
    const ws = await startOffscreen(listener);
    listener({ type: 'OFFSCREEN_STOP' });
    const last = ws.sent[ws.sent.length - 1];
    expect(new TextDecoder().decode(last)).toBe(protocol.end_of_audio);
    expect(ws.readyState).toBe(FakeWebSocket.CLOSED);
  });
});

// ---------------------------------------------------------------------------
// Options page storage round-trip (options.js)
// ---------------------------------------------------------------------------

function buildOptionsDOM() {
  document.body.innerHTML = `
    <input id="host"><input id="port"><input id="language">
    <input id="task"><input id="model">
    <input type="checkbox" id="useVad"><input id="apiKey">
    <button id="save"></button><span id="status"></span>
  `;
}

describe('options page', () => {
  test('defaults populate the form', () => {
    buildOptionsDOM();
    jest.isolateModules(() => require('../options.js'));
    expect(document.getElementById('host').value).toBe('localhost');
    expect(document.getElementById('port').value).toBe('9090');
    expect(document.getElementById('useVad').checked).toBe(true);
  });

  test('save parses the port and nulls an empty language', () => {
    buildOptionsDOM();
    jest.isolateModules(() => require('../options.js'));
    document.getElementById('port').value = '8123';
    document.getElementById('language').value = '';
    document.getElementById('save').click();
    expect(storageData.port).toBe(8123);
    expect(storageData.language).toBeNull();
    expect(document.getElementById('status').textContent).toContain('saved');
  });

  test('saved values survive a reload round-trip', () => {
    buildOptionsDOM();
    jest.isolateModules(() => require('../options.js'));
    document.getElementById('host').value = 'tpu.internal';
    document.getElementById('save').click();
    buildOptionsDOM();
    jest.isolateModules(() => require('../options.js'));
    expect(document.getElementById('host').value).toBe('tpu.internal');
  });
});

// ---------------------------------------------------------------------------
// Background orchestration (background.js)
// ---------------------------------------------------------------------------

describe('background service worker', () => {
  function loadBackground() {
    jest.isolateModules(() => require('../background.js'));
    return chrome.runtime.onMessage.addListener.mock.calls[0][0];
  }

  test('START_CAPTURE creates the offscreen doc and forwards options', async () => {
    const listener = loadBackground();
    const sendResponse = jest.fn();
    listener({ type: 'START_CAPTURE', tabId: 42 }, {}, sendResponse);
    await flushPromises();
    expect(chrome.offscreen.createDocument).toHaveBeenCalled();
    expect(chrome.runtime.sendMessage).toHaveBeenCalledWith(
      expect.objectContaining({
        type: 'OFFSCREEN_START',
        streamId: 'stream-1',
        tabId: 42,
      })
    );
    expect(sendResponse).toHaveBeenCalledWith({ ok: true });
  });

  test('SEGMENTS relays captions into the captured tab', async () => {
    const listener = loadBackground();
    const segments = [protocol.example_segment];
    listener({ type: 'SEGMENTS', tabId: 42, segments }, {}, jest.fn());
    await flushPromises();
    expect(chrome.tabs.sendMessage).toHaveBeenCalledWith(42, {
      type: 'SHOW_CAPTIONS',
      segments,
    });
  });
});

// ---------------------------------------------------------------------------
// Captions overlay (content.js)
// ---------------------------------------------------------------------------

describe('captions overlay', () => {
  test('renders deduplicated trailing segment texts', () => {
    jest.isolateModules(() => require('../content.js'));
    const listener = chrome.runtime.onMessage.addListener.mock.calls[0][0];
    listener({
      type: 'SHOW_CAPTIONS',
      segments: [
        { text: ' one' },
        { text: ' one' },
        { text: ' two' },
        { text: ' three' },
        { text: ' four' },
      ],
    });
    const box = document.getElementById('__wl_captions');
    expect(box.textContent).toBe('two three four');
    expect(box.style.display).toBe('block');
  });
});
