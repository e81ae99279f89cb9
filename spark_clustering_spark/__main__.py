from spark_clustering_spark.cli import main

raise SystemExit(main())
