// WhisperLiveClient.swift — iOS client for whisperlive-tpu.
//
// Same wire protocol as the Python client: JSON handshake, binary float32
// PCM at 16 kHz mono, "END_OF_AUDIO" terminator; server pushes
// {uid, segments: [...]} JSON. (Role equivalent of the reference's
// Audio-Transcription-iOS AudioWebSocket/AudioStream.)

import AVFoundation
import Foundation

public struct TranscriptSegment: Identifiable, Equatable {
    public let id = UUID()
    public let start: Double
    public let end: Double
    public let text: String
    public let completed: Bool
    public let speaker: String?
}

public final class WhisperLiveClient: NSObject, ObservableObject {
    @Published public private(set) var segments: [TranscriptSegment] = []
    @Published public private(set) var isConnected = false
    @Published public private(set) var detectedLanguage: String?

    private var webSocket: URLSessionWebSocketTask?
    private let uid = UUID().uuidString
    private let engine = AVAudioEngine()
    private var session: URLSession!

    public var host: String = "localhost"
    public var port: Int = 9090
    public var language: String? = nil
    public var task: String = "transcribe"
    public var model: String = "small"
    public var useVAD: Bool = true
    public var apiKey: String? = nil

    public override init() {
        super.init()
        session = URLSession(configuration: .default, delegate: nil, delegateQueue: .main)
    }

    // MARK: - Connection

    public func connect() {
        var components = URLComponents()
        components.scheme = "ws"
        components.host = host
        components.port = port
        if let key = apiKey {
            components.queryItems = [URLQueryItem(name: "token", value: key)]
        }
        guard let url = components.url else { return }
        webSocket = session.webSocketTask(with: url)
        webSocket?.resume()
        sendHandshake()
        receiveLoop()
    }

    private func sendHandshake() {
        let options: [String: Any?] = [
            "uid": uid,
            "language": language,
            "task": task,
            "model": model,
            "use_vad": useVAD,
        ]
        guard
            let data = try? JSONSerialization.data(
                withJSONObject: options.compactMapValues { $0 }),
            let text = String(data: data, encoding: .utf8)
        else { return }
        webSocket?.send(.string(text)) { _ in }
    }

    private func receiveLoop() {
        webSocket?.receive { [weak self] result in
            guard let self = self else { return }
            switch result {
            case .failure:
                DispatchQueue.main.async { self.isConnected = false }
            case .success(let message):
                if case .string(let text) = message { self.handleMessage(text) }
                self.receiveLoop()
            }
        }
    }

    private func handleMessage(_ text: String) {
        guard let data = text.data(using: .utf8),
            let json = try? JSONSerialization.jsonObject(with: data) as? [String: Any],
            json["uid"] as? String == uid
        else { return }

        if let message = json["message"] as? String, message == "SERVER_READY" {
            DispatchQueue.main.async { self.isConnected = true }
            return
        }
        if let lang = json["language"] as? String {
            DispatchQueue.main.async { self.detectedLanguage = lang }
            return
        }
        guard let rawSegments = json["segments"] as? [[String: Any]] else { return }
        let parsed = rawSegments.compactMap { seg -> TranscriptSegment? in
            guard let text = seg["text"] as? String else { return nil }
            return TranscriptSegment(
                start: Double(seg["start"] as? String ?? "0") ?? 0,
                end: Double(seg["end"] as? String ?? "0") ?? 0,
                text: text,
                completed: seg["completed"] as? Bool ?? false,
                speaker: seg["speaker"] as? String
            )
        }
        DispatchQueue.main.async { self.mergeSegments(parsed) }
    }

    private func mergeSegments(_ incoming: [TranscriptSegment]) {
        // committed segments accumulate; the trailing partial is replaced
        var committed = segments.filter { $0.completed }
        for seg in incoming where seg.completed {
            if !committed.contains(where: {
                $0.start == seg.start && $0.end == seg.end && $0.text == seg.text
            }) {
                committed.append(seg)
            }
        }
        var out = committed
        if let partial = incoming.last, !partial.completed {
            out.append(partial)
        }
        segments = out
    }

    // MARK: - Microphone streaming

    public func startStreaming() throws {
        let audioSession = AVAudioSession.sharedInstance()
        try audioSession.setCategory(.record, mode: .measurement)
        try audioSession.setActive(true)

        let input = engine.inputNode
        let inputFormat = input.outputFormat(forBus: 0)
        guard
            let targetFormat = AVAudioFormat(
                commonFormat: .pcmFormatFloat32, sampleRate: 16000, channels: 1,
                interleaved: false),
            let converter = AVAudioConverter(from: inputFormat, to: targetFormat)
        else { throw NSError(domain: "WhisperLive", code: 1) }

        input.installTap(onBus: 0, bufferSize: 4096, format: inputFormat) {
            [weak self] buffer, _ in
            guard let self = self else { return }
            let ratio = 16000.0 / inputFormat.sampleRate
            let capacity = AVAudioFrameCount(Double(buffer.frameLength) * ratio + 16)
            guard
                let out = AVAudioPCMBuffer(pcmFormat: targetFormat, frameCapacity: capacity)
            else { return }
            var error: NSError?
            converter.convert(to: out, error: &error) { _, status in
                status.pointee = .haveData
                return buffer
            }
            guard error == nil, let ch = out.floatChannelData else { return }
            let data = Data(
                bytes: ch[0], count: Int(out.frameLength) * MemoryLayout<Float>.size)
            self.webSocket?.send(.data(data)) { _ in }
        }
        engine.prepare()
        try engine.start()
    }

    public func stopStreaming() {
        engine.inputNode.removeTap(onBus: 0)
        engine.stop()
        if let data = "END_OF_AUDIO".data(using: .utf8) {
            webSocket?.send(.data(data)) { _ in }
        }
    }

    public func disconnect() {
        stopStreaming()
        webSocket?.cancel(with: .normalClosure, reason: nil)
        webSocket = nil
        isConnected = false
    }
}
