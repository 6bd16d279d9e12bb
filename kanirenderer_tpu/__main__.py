from kanirenderer_tpu.cli import main

raise SystemExit(main())
