"""``python -m datafusion_gpu_spark`` — CLI / REPL entry point."""

from datafusion_gpu_spark.repl import main

raise SystemExit(main())
