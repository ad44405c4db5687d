"""Command-line tools mirroring the reference binaries' flag surfaces.

Each module exposes ``main(argv) -> int`` and is runnable via
``python -m dspfun_tpu.tools.<name>`` or the ``dspfun`` dispatcher.
"""
