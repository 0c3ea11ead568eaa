"""Thin spark-submit driver script — all logic lives in the shipped
package (quant_feature_pipeline_spark.jobs) so the SAME code runs on the
driver and, via --py-files, on every executor:

    spark-submit --master <cluster> \
        --py-files dist/quant_feature_pipeline_spark.zip \
        jobs/run_features.py --input ... --checkpoint-root ...
"""

from quant_feature_pipeline_spark.jobs import main

if __name__ == "__main__":
    main()
