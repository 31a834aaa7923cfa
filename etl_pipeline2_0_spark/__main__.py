from etl_pipeline2_0_spark.cli import main

raise SystemExit(main())
