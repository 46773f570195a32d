from pyspark_unload_to_gcs_spark.cli import main

raise SystemExit(main())
