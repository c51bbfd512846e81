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
            if let lang = client.detectedLanguage {
                Text("Language: \(lang)").font(.caption)
            }
        }
        .padding()
    }
}
