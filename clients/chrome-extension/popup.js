const btn = document.getElementById("toggle");

function render(capturing) {
  btn.textContent = capturing ? "Stop transcribing" : "Start transcribing this tab";
  btn.dataset.capturing = capturing ? "1" : "";
}

chrome.runtime.sendMessage({ type: "GET_STATE" }, (s) => render(s && s.capturing));

btn.addEventListener("click", async () => {
  const [tab] = await chrome.tabs.query({ active: true, currentWindow: true });
  const capturing = btn.dataset.capturing === "1";
  chrome.runtime.sendMessage(
    { type: capturing ? "STOP_CAPTURE" : "START_CAPTURE", tabId: tab.id },
    () => render(!capturing)
  );
});

document.getElementById("opts").addEventListener("click", () => {
  chrome.runtime.openOptionsPage();
});
