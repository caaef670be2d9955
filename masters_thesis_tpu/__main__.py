from masters_thesis_tpu.cli import main

raise SystemExit(main())
