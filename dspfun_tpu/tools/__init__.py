"""Command-line tools mirroring the reference binaries' flag surfaces.

Each module exposes ``main(argv) -> int`` and is runnable via
``python -m dspfun_tpu.tools.<name>`` or the ``dspfun`` dispatcher.
"""

import os
import sys


def run_main(main) -> None:
    """CLI entry wrapper: flush and exit without interpreter teardown.

    The force-registered TPU plugin in some environments crashes
    intermittently in its atexit teardown after the backend has been
    switched (e.g. DSPFUN_PLATFORM=cpu).  Outputs are already flushed
    to disk by ``main``; skipping teardown makes the CLIs reliable in
    pipelines.
    """
    code = main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(code)
