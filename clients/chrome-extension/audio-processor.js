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
    this.phase = 0;
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
    // linear-interp resample to 16 kHz
    const out = [];
    let ph = this.phase;
    while (ph < n - 1) {
      const i = Math.floor(ph);
      const frac = ph - i;
      out.push(mono[i] * (1 - frac) + mono[i + 1] * frac);
      ph += this.ratio;
    }
    this.phase = ph - n;
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
