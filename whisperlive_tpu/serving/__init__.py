"""Serving stack: WebSocket server, session state machine, REST endpoint."""
