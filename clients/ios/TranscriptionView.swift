// TranscriptionView.swift — minimal SwiftUI UI over WhisperLiveClient.

import SwiftUI

struct TranscriptionView: View {
    @StateObject private var client = WhisperLiveClient()
    @State private var streaming = false
    @AppStorage("wl_host") private var host = "localhost"
    @AppStorage("wl_port") private var port = 9090

    var body: some View {
        VStack(spacing: 12) {
            HStack {
                TextField("Host", text: $host).textFieldStyle(.roundedBorder)
                TextField("Port", value: $port, format: .number)
                    .textFieldStyle(.roundedBorder)
                    .frame(width: 80)
            }
            ScrollViewReader { proxy in
                ScrollView {
                    LazyVStack(alignment: .leading, spacing: 6) {
                        ForEach(client.segments) { seg in
                            HStack(alignment: .top) {
                                if let speaker = seg.speaker {
                                    Text(speaker).font(.caption).foregroundColor(.blue)
                                }
                                Text(seg.text)
                                    .foregroundColor(seg.completed ? .primary : .secondary)
                                    .id(seg.id)
                            }
                        }
                    }
                }
                .onChange(of: client.segments.count) { _ in
                    if let last = client.segments.last {
                        proxy.scrollTo(last.id, anchor: .bottom)
                    }
                }
            }
            Button(streaming ? "Stop" : "Start transcribing") {
                if streaming {
                    client.stopStreaming()  // END_OF_AUDIO, then close
                    client.disconnect()
                } else {
                    client.host = host
                    client.port = port
                    client.connect()
                    try? client.startStreaming()
                }
                streaming.toggle()
            }
            .buttonStyle(.borderedProminent)
            statusLine
            if let lang = client.detectedLanguage {
                Text("Language: \(lang)").font(.caption)
            }
        }
        .padding()
    }

    /// Surfaces WAIT / ERROR / WARNING / DISCONNECT states from the
    /// server (reference AudioWebSocket.swift:188-199 logs these; here
    /// they reach the user).
    @ViewBuilder private var statusLine: some View {
        switch client.status {
        case .idle:
            EmptyView()
        case .connecting:
            Text("Connecting…").font(.caption).foregroundColor(.secondary)
        case .waiting(let minutes):
            Text("Server full — estimated wait \(minutes, specifier: "%.1f") min")
                .font(.caption).foregroundColor(.orange)
        case .ready:
            Text("Connected").font(.caption).foregroundColor(.green)
        case .warning(let message):
            Text("Warning: \(message)").font(.caption).foregroundColor(.orange)
        case .error(let message):
            Text("Error: \(message)").font(.caption).foregroundColor(.red)
        case .disconnected:
            Text("Disconnected by server (session time limit)")
                .font(.caption).foregroundColor(.red)
        }
    }
}
