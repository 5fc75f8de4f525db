from etl_guiacores_spark.cli import main

main()
