from de_spark.cli import main

raise SystemExit(main())
