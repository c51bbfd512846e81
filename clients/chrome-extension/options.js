const FIELDS = ["host", "port", "language", "task", "model", "useVad", "apiKey"];
const DEFAULTS = {
  host: "localhost",
  port: 9090,
  language: "",
  task: "transcribe",
  model: "small",
  useVad: true,
  apiKey: "",
};

chrome.storage.sync.get(DEFAULTS, (opts) => {
  for (const f of FIELDS) {
    const el = document.getElementById(f);
    if (el.type === "checkbox") el.checked = !!opts[f];
    else el.value = opts[f] ?? "";
  }
});

document.getElementById("save").addEventListener("click", () => {
  const out = {};
  for (const f of FIELDS) {
    const el = document.getElementById(f);
    out[f] = el.type === "checkbox" ? el.checked : el.value;
  }
  out.port = parseInt(out.port, 10) || 9090;
  out.language = out.language || null;
  chrome.storage.sync.set(out, () => {
    document.getElementById("status").textContent = " saved";
    setTimeout(() => (document.getElementById("status").textContent = ""), 1500);
  });
});
