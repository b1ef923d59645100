from osmzen_spark.payload.images import (  # noqa: F401
    decode_image_batch,
    fan_out_scan,
    psnr,
    with_image_features,
)
