from osmzen_spark.payload.images import decode_image_batch, with_image_features, psnr  # noqa: F401
