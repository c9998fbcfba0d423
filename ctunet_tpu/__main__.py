"""``python -m ctunet_tpu <cfg.ini>`` — CLI entry (ref ``Model.py:554-562``)."""

from .trainer import cli

cli()
