"""CLI entry points (flag-compatible with the reference's run_server.py /
run_client.py)."""
