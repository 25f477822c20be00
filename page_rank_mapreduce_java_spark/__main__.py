from page_rank_mapreduce_java_spark.cli import main

raise SystemExit(main())
