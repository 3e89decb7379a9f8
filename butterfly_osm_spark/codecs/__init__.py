from .png import decode_image, encode_png, encode_qnt, psnr_db  # noqa: F401
