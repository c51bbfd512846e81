// MV3 service worker: orchestrates capture start/stop and relays transcript
// segments to the captions overlay in the page.

let capturing = false;
let offscreenReady = false;

async function ensureOffscreen() {
  if (offscreenReady) return;
  const has = await chrome.offscreen.hasDocument?.();
  if (!has) {
    await chrome.offscreen.createDocument({
      url: "offscreen.html",
      reasons: ["USER_MEDIA"],
      justification: "Tab audio capture and WebSocket streaming",
    });
  }
  offscreenReady = true;
}

chrome.runtime.onMessage.addListener((msg, sender, sendResponse) => {
  (async () => {
    if (msg.type === "START_CAPTURE") {
      await ensureOffscreen();
      const streamId = await chrome.tabCapture.getMediaStreamId({
        targetTabId: msg.tabId,
      });
      const options = await chrome.storage.sync.get({
        host: "localhost",
        port: 9090,
        language: null,
        task: "transcribe",
        model: "small",
        useVad: true,
        apiKey: null,
      });
      chrome.runtime.sendMessage({
        type: "OFFSCREEN_START",
        streamId,
        tabId: msg.tabId,
        options,
      });
      capturing = true;
      sendResponse({ ok: true });
    } else if (msg.type === "STOP_CAPTURE") {
      chrome.runtime.sendMessage({ type: "OFFSCREEN_STOP" });
      capturing = false;
      sendResponse({ ok: true });
    } else if (msg.type === "SEGMENTS") {
      // relay to the captions overlay in the captured tab
      try {
        await chrome.scripting.executeScript({
          target: { tabId: msg.tabId },
          files: ["content.js"],
        });
      } catch (e) {
        /* already injected */
      }
      chrome.tabs.sendMessage(msg.tabId, {
        type: "SHOW_CAPTIONS",
        segments: msg.segments,
      });
      sendResponse({ ok: true });
    } else if (msg.type === "GET_STATE") {
      sendResponse({ capturing });
    }
  })();
  return true; // async response
});
