#!/usr/bin/env python
"""Launcher shim (same invocation shape as the reference's run_server.py)."""

from whisperlive_tpu.cli.run_server import main

if __name__ == "__main__":
    main()
