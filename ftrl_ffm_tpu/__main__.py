from ftrl_ffm_tpu.cli import main

import sys

sys.exit(main())
