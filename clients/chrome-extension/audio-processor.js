// AudioWorklet: mono mixdown + 48k->16k resample, posts Float32 blocks.
// (Same role as the reference extension's audiopreprocessor.js, written for
// this project's server: float32 PCM at 16 kHz, ~0.25 s blocks.)

class PCM16kProcessor extends AudioWorkletProcessor {
  constructor() {
    super();
    this.ratio = sampleRate / 16000;
    this.acc = [];
    this.accLen = 0;
    this.blockSamples = 4096; // ~0.25 s at 16 kHz
    this.phase = 0; // block-relative position, may sit in [-1, 0) at a seam
    this.prev = 0; // last sample of the previous block (seam interpolation)
  }

  process(inputs) {
    const input = inputs[0];
    if (!input || input.length === 0) return true;
    const n = input[0].length;
    // mono mixdown
    const mono = new Float32Array(n);
    for (let c = 0; c < input.length; c++) {
      const ch = input[c];
      for (let i = 0; i < n; i++) mono[i] += ch[i] / input.length;
    }
    // Linear-interp resample to 16 kHz over [prev | mono]: at non-integer
    // ratios (44.1 kHz tabs) the phase crosses block boundaries mid-
    // interval, so the seam interpolates against the carried last sample
    // instead of reading mono[-1] or dropping the final interval.
    const ext = new Float32Array(n + 1);
    ext[0] = this.prev;
    ext.set(mono, 1);
    const out = [];
    let ep = this.phase + 1; // position in ext coordinates
    while (ep < n) {
      const i = Math.floor(ep);
      const frac = ep - i;
      out.push(ext[i] * (1 - frac) + ext[i + 1] * frac);
      ep += this.ratio;
    }
    this.phase = ep - 1 - n;
    this.prev = mono[n - 1];
    if (out.length) {
      this.acc.push(Float32Array.from(out));
      this.accLen += out.length;
    }
    if (this.accLen >= this.blockSamples) {
      const block = new Float32Array(this.accLen);
      let off = 0;
      for (const a of this.acc) {
        block.set(a, off);
        off += a.length;
      }
      this.acc = [];
      this.accLen = 0;
      this.port.postMessage(block.buffer, [block.buffer]);
    }
    return true;
  }
}

registerProcessor("pcm16k-processor", PCM16kProcessor);
