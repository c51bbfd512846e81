// WhisperLiveClient.swift — iOS client for whisperlive-tpu.
//
// Same wire protocol as the Python client: JSON handshake, binary float32
// PCM at 16 kHz mono, "END_OF_AUDIO" terminator; server pushes
// {uid, segments: [...]} JSON plus {uid, status: WAIT|ERROR|WARNING,
// message} and {uid, message: SERVER_READY|DISCONNECT} control frames.
// Role equivalent of the reference's Audio-Transcription-iOS
// AudioWebSocket/AudioStream (AudioWebSocket.swift:63-215): reconnect
// with exponential backoff and a retry cap, keep-alive pings, WAIT/ERROR/
// WARNING surfacing, server-ready send gating, END_OF_AUDIO on stop.

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

/// Connection lifecycle surfaced to the UI.
public enum ClientStatus: Equatable {
    case idle
    case connecting
    /// Server is at capacity; associated value is the estimated wait in
    /// minutes (the server sends a number in "message").
    case waiting(Double)
    case ready
    case warning(String)
    case error(String)
    case disconnected
}

public final class WhisperLiveClient: NSObject, ObservableObject, URLSessionWebSocketDelegate {
    @Published public private(set) var segments: [TranscriptSegment] = []
    @Published public private(set) var isConnected = false
    @Published public private(set) var detectedLanguage: String?
    @Published public private(set) var status: ClientStatus = .idle

    private var webSocket: URLSessionWebSocketTask?
    private let uid = UUID().uuidString
    private let engine = AVAudioEngine()
    private var session: URLSession!
    private var pingTimer: Timer?
    private var retryCount = 0
    private let maxRetries = 3
    private var intentionalClose = false
    private var serverReady = false

    public var host: String = "localhost"
    public var port: Int = 9090
    public var language: String? = nil
    public var task: String = "transcribe"
    public var model: String = "small"
    public var useVAD: Bool = true
    public var apiKey: String? = nil

    public override init() {
        super.init()
        session = URLSession(configuration: .default, delegate: self, delegateQueue: .main)
    }

    // MARK: - Connection

    public func connect() {
        intentionalClose = false
        retryCount = 0
        openSocket()
    }

    private func openSocket() {
        guard retryCount <= maxRetries else {
            setStatus(.error("maximum reconnect attempts exceeded"))
            return
        }
        var components = URLComponents()
        components.scheme = "ws"
        components.host = host
        components.port = port
        if let key = apiKey {
            components.queryItems = [URLQueryItem(name: "token", value: key)]
        }
        guard let url = components.url else { return }
        setStatus(.connecting)
        serverReady = false
        webSocket = session.webSocketTask(with: url)
        webSocket?.resume()
        sendHandshake()
        receiveLoop()
        startPing()
    }

    /// Exponential backoff capped at 5 s, like the reference client.
    private func reconnect() {
        guard !intentionalClose else { return }
        stopPing()
        serverReady = false
        DispatchQueue.main.async { self.isConnected = false }
        retryCount += 1
        guard retryCount <= maxRetries else {
            setStatus(.error("maximum reconnect attempts exceeded"))
            return
        }
        let delay = min(5.0, pow(2.0, Double(retryCount)))
        DispatchQueue.global().asyncAfter(deadline: .now() + delay) { [weak self] in
            self?.openSocket()
        }
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
        webSocket?.send(.string(text)) { [weak self] error in
            if error != nil { self?.reconnect() }
        }
    }

    private func receiveLoop() {
        webSocket?.receive { [weak self] result in
            guard let self = self else { return }
            switch result {
            case .failure:
                self.reconnect()
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

        // {"status": WAIT|ERROR|WARNING, "message": ...}
        if let statusField = json["status"] as? String {
            switch statusField {
            case "WAIT":
                let minutes = (json["message"] as? NSNumber)?.doubleValue
                    ?? Double(json["message"] as? String ?? "") ?? 0
                setStatus(.waiting(minutes))
            case "ERROR":
                setStatus(.error(json["message"] as? String ?? "server error"))
            case "WARNING":
                setStatus(.warning(json["message"] as? String ?? ""))
            default:
                break
            }
            return
        }
        if let message = json["message"] as? String {
            if message == "SERVER_READY" {
                serverReady = true
                retryCount = 0
                setStatus(.ready)
                DispatchQueue.main.async { self.isConnected = true }
                return
            }
            if message == "DISCONNECT" {
                // server-side session timeout: do not auto-reconnect (the
                // server evicted us on purpose), surface it instead
                intentionalClose = true
                setStatus(.disconnected)
                DispatchQueue.main.async { self.isConnected = false }
                return
            }
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

    private func setStatus(_ s: ClientStatus) {
        DispatchQueue.main.async { self.status = s }
    }

    // MARK: - Keep-alive

    private func startPing() {
        stopPing()
        let timer = Timer.scheduledTimer(withTimeInterval: 15.0, repeats: true) {
            [weak self] _ in
            self?.webSocket?.sendPing { error in
                if error != nil { self?.reconnect() }
            }
        }
        RunLoop.main.add(timer, forMode: .common)
        pingTimer = timer
    }

    private func stopPing() {
        pingTimer?.invalidate()
        pingTimer = nil
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
            // drop microphone frames until the server has accepted the
            // session — sending early races the handshake (the reference
            // gates sends the same way)
            guard self.serverReady, self.webSocket?.state == .running else { return }
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
            self.webSocket?.send(.data(data)) { [weak self] error in
                if error != nil { self?.reconnect() }
            }
        }
        engine.prepare()
        try engine.start()
    }

    public func stopStreaming() {
        engine.inputNode.removeTap(onBus: 0)
        engine.stop()
        if webSocket?.state == .running, let data = "END_OF_AUDIO".data(using: .utf8) {
            webSocket?.send(.data(data)) { _ in }
        }
    }

    public func disconnect() {
        intentionalClose = true
        stopStreaming()
        stopPing()
        webSocket?.cancel(with: .normalClosure, reason: nil)
        webSocket = nil
        isConnected = false
        setStatus(.idle)
    }

    // MARK: - URLSessionWebSocketDelegate

    public func urlSession(
        _ session: URLSession, webSocketTask: URLSessionWebSocketTask,
        didCloseWith closeCode: URLSessionWebSocketTask.CloseCode, reason: Data?
    ) {
        stopPing()
        reconnect()
    }
}
