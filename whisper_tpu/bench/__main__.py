import sys

from whisper_tpu.bench.cli import main

sys.exit(main())
