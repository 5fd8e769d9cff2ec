from datafusion_tpu.console.main import main

raise SystemExit(main())
