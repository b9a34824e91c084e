"""``python -m vit_ed_tpu.serve`` — the HTTP serving host CLI."""

from .server import main

main()
