#!/usr/bin/env python
"""Launcher shim (same invocation shape as the reference's run_client.py)."""

from whisperlive_tpu.cli.run_client import main

if __name__ == "__main__":
    main()
