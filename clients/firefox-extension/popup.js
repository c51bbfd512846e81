const btn = document.getElementById("toggle");

function render(capturing) {
  btn.textContent = capturing ? "Stop transcribing" : "Start transcribing this tab";
  btn.dataset.capturing = capturing ? "1" : "";
}

browser.runtime.sendMessage({ type: "GET_STATE" }).then((s) => render(s && s.capturing));

btn.addEventListener("click", async () => {
  const [tab] = await browser.tabs.query({ active: true, currentWindow: true });
  const capturing = btn.dataset.capturing === "1";
  await browser.runtime.sendMessage({
    type: capturing ? "STOP_CAPTURE" : "START_CAPTURE",
    tabId: tab.id,
  });
  render(!capturing);
});

document.getElementById("opts").addEventListener("click", () => {
  browser.runtime.openOptionsPage();
});
