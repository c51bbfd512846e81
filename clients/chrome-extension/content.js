// Captions overlay injected into the captured tab.

(function () {
  if (window.__wlCaptionsInstalled) return;
  window.__wlCaptionsInstalled = true;

  const box = document.createElement("div");
  box.id = "__wl_captions";
  Object.assign(box.style, {
    position: "fixed",
    left: "50%",
    bottom: "6%",
    transform: "translateX(-50%)",
    maxWidth: "80%",
    padding: "8px 16px",
    background: "rgba(0,0,0,0.75)",
    color: "#fff",
    font: "18px/1.4 sans-serif",
    borderRadius: "8px",
    zIndex: 2147483647,
    display: "none",
    whiteSpace: "pre-wrap",
  });
  document.documentElement.appendChild(box);

  chrome.runtime.onMessage.addListener((msg) => {
    if (msg.type !== "SHOW_CAPTIONS" || !msg.segments) return;
    const texts = [];
    for (const seg of msg.segments) {
      const t = (seg.text || "").trim();
      if (t && texts[texts.length - 1] !== t) texts.push(t);
    }
    box.textContent = texts.slice(-3).join(" ");
    box.style.display = box.textContent ? "block" : "none";
  });
})();
