from letsearch_spark.cli import main

raise SystemExit(main())
