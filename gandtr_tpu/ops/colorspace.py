"""Colorspace conversions in pure JAX, matching OpenCV's float32 paths.

The reference converts float RGB∈[0,1] with cv2.cvtColor and normalizes into
[0,1] ranges (/root/reference/mdir/components/data/transform/functional.py:29-85).
OpenCV's Lab/Luv float conversions apply the inverse sRGB gamma internally (via a
1024-entry spline table); we use the analytic sRGB curve, which agrees to ~1e-4.

All functions take/return (..., 3) channel-last float32 arrays and are jit-safe.
"""
import jax.numpy as jnp

# D65 white point used by OpenCV
_WHITE = (0.950456, 1.0, 1.088754)

# linear RGB -> XYZ (OpenCV/sRGB primaries)
_RGB2XYZ = (
    (0.412453, 0.357580, 0.180423),
    (0.212671, 0.715160, 0.072169),
    (0.019334, 0.119193, 0.950227),
)


def _srgb_inv_gamma(x):
    """sRGB EOTF: companded -> linear."""
    return jnp.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def _srgb_gamma(x):
    """sRGB OETF: linear -> companded."""
    x = jnp.clip(x, 0.0, None)
    return jnp.where(x <= 0.0031308, x * 12.92, 1.055 * x ** (1.0 / 2.4) - 0.055)


def _rgb_to_xyz(rgb, gamma=True):
    if gamma:
        rgb = _srgb_inv_gamma(rgb)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    x = _RGB2XYZ[0][0] * r + _RGB2XYZ[0][1] * g + _RGB2XYZ[0][2] * b
    y = _RGB2XYZ[1][0] * r + _RGB2XYZ[1][1] * g + _RGB2XYZ[1][2] * b
    z = _RGB2XYZ[2][0] * r + _RGB2XYZ[2][1] * g + _RGB2XYZ[2][2] * b
    return x, y, z


def _lab_f(t):
    return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)


def _lab_f_inv(ft):
    return jnp.where(ft > 0.2068966, ft ** 3, (ft - 16.0 / 116.0) / 7.787)


def rgb_to_lab(rgb):
    """float RGB[0,1] -> Lab (L∈[0,100], a,b∈[-127,127]); cv2.COLOR_RGB2LAB float path."""
    x, y, z = _rgb_to_xyz(rgb)
    fx = _lab_f(x / _WHITE[0])
    fy = _lab_f(y / _WHITE[1])
    fz = _lab_f(z / _WHITE[2])
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def lab_to_rgb(lab):
    """Inverse of rgb_to_lab; cv2.COLOR_LAB2RGB float path."""
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    x = _lab_f_inv(fx) * _WHITE[0]
    y = _lab_f_inv(fy) * _WHITE[1]
    z = _lab_f_inv(fz) * _WHITE[2]
    r = 3.240479 * x - 1.537150 * y - 0.498535 * z
    g = -0.969256 * x + 1.875992 * y + 0.041556 * z
    bl = 0.055648 * x - 0.204043 * y + 1.057311 * z
    rgb = jnp.stack([r, g, bl], axis=-1)
    return _srgb_gamma(rgb)


def rgb_to_luv(rgb):
    """cv2.COLOR_RGB2LUV float path (with sRGB gamma)."""
    x, y, z = _rgb_to_xyz(rgb)
    L = jnp.where(y > 0.008856, 116.0 * jnp.cbrt(y) - 16.0, 903.3 * y)
    d = x + 15.0 * y + 3.0 * z
    d = jnp.where(d == 0, 1e-20, d)
    u_ = 4.0 * x / d
    v_ = 9.0 * y / d
    xw, yw, zw = _WHITE
    dn = xw + 15.0 * yw + 3.0 * zw
    un = 4.0 * xw / dn
    vn = 9.0 * yw / dn
    u = 13.0 * L * (u_ - un)
    v = 13.0 * L * (v_ - vn)
    return jnp.stack([L, u, v], axis=-1)


def luv_to_rgb(luv):
    L, u, v = luv[..., 0], luv[..., 1], luv[..., 2]
    xw, yw, zw = _WHITE
    dn = xw + 15.0 * yw + 3.0 * zw
    un = 4.0 * xw / dn
    vn = 9.0 * yw / dn
    Ls = jnp.where(L == 0, 1e-20, L)
    u_ = u / (13.0 * Ls) + un
    v_ = v / (13.0 * Ls) + vn
    y = jnp.where(L > 8.0, ((L + 16.0) / 116.0) ** 3, L / 903.3)
    v_ = jnp.where(v_ == 0, 1e-20, v_)
    x = y * 9.0 * u_ / (4.0 * v_)
    z = y * (12.0 - 3.0 * u_ - 20.0 * v_) / (4.0 * v_)
    r = 3.240479 * x - 1.537150 * y - 0.498535 * z
    g = -0.969256 * x + 1.875992 * y + 0.041556 * z
    b = 0.055648 * x - 0.204043 * y + 1.057311 * z
    return _srgb_gamma(jnp.stack([r, g, b], axis=-1))


def rgb_to_hsv(rgb):
    """cv2.COLOR_RGB2HSV float path: H∈[0,360), S,V∈[0,1]. No gamma."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    s = jnp.where(v == 0, 0.0, diff / jnp.where(v == 0, 1.0, v))
    safe = jnp.where(diff == 0, 1.0, diff)
    h = jnp.where(v == r, 60.0 * (g - b) / safe,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe,
                  240.0 + 60.0 * (r - g) / safe))
    h = jnp.where(diff == 0, 0.0, h)
    h = jnp.where(h < 0, h + 360.0, h)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h = (h / 60.0) % 6.0
    i = jnp.floor(h)
    f = h - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.stack([r, g, b], axis=-1)


def rgb_to_hls(rgb):
    """cv2.COLOR_RGB2HLS float path: H∈[0,360), L,S∈[0,1]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    l = (mx + mn) / 2.0
    diff = mx - mn
    denom = jnp.where(l < 0.5, mx + mn, 2.0 - mx - mn)
    s = jnp.where(diff == 0, 0.0, diff / jnp.where(denom == 0, 1.0, denom))
    safe = jnp.where(diff == 0, 1.0, diff)
    h = jnp.where(mx == r, 60.0 * (g - b) / safe,
        jnp.where(mx == g, 120.0 + 60.0 * (b - r) / safe,
                  240.0 + 60.0 * (r - g) / safe))
    h = jnp.where(diff == 0, 0.0, h)
    h = jnp.where(h < 0, h + 360.0, h)
    return jnp.stack([h, l, s], axis=-1)


def hls_to_rgb(hls):
    h, l, s = hls[..., 0], hls[..., 1], hls[..., 2]
    q = jnp.where(l < 0.5, l * (1.0 + s), l + s - l * s)
    p = 2.0 * l - q

    def hue2rgb(t):
        t = t % 360.0
        return jnp.where(t < 60.0, p + (q - p) * t / 60.0,
               jnp.where(t < 180.0, q,
               jnp.where(t < 240.0, p + (q - p) * (240.0 - t) / 60.0, p)))

    r = hue2rgb(h + 120.0)
    g = hue2rgb(h)
    b = hue2rgb(h - 120.0)
    return jnp.stack([r, g, b], axis=-1)


def rgb_to_xyz(rgb):
    """cv2.COLOR_RGB2XYZ float path — NO gamma correction in OpenCV."""
    x, y, z = _rgb_to_xyz(rgb, gamma=False)
    return jnp.stack([x, y, z], axis=-1)


def xyz_to_rgb(xyz):
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r = 3.240479 * x - 1.537150 * y - 0.498535 * z
    g = -0.969256 * x + 1.875992 * y + 0.041556 * z
    b = 0.055648 * x - 0.204043 * y + 1.057311 * z
    return jnp.stack([r, g, b], axis=-1)


def rgb_to_gray(rgb):
    """cv2.COLOR_RGB2GRAY: 0.299 R + 0.587 G + 0.114 B."""
    return (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])[..., None]


# ---------------------------------------------------------------------------
# normalized spaces (reference functional.py:29-79): every channel in [0, 1]
# ---------------------------------------------------------------------------

def rgb2normspace(img, colorspace):
    """RGB[0,1] -> normalized colorspace, matching reference rgb2normspace."""
    colorspace = colorspace.lower()
    if len(colorspace) == 4 and colorspace[0] == "s":
        img = img ** 2.2
        colorspace = colorspace[1:]

    if colorspace == "lab":
        lab = rgb_to_lab(img)
        return (lab + jnp.array([0.0, 128.0, 128.0])) / jnp.array([100.0, 255.0, 255.0])
    if colorspace == "luv":
        luv = rgb_to_luv(img)
        return (luv + jnp.array([0.0, 134.0, 140.0])) / jnp.array([100.0, 354.0, 262.0])
    if colorspace == "lsh":
        hls = rgb_to_hls(img) / jnp.array([360.0, 1.0, 1.0])
        return jnp.stack([hls[..., 1], hls[..., 2], hls[..., 0]], axis=-1)
    if colorspace == "hsv":
        return rgb_to_hsv(img) / jnp.array([360.0, 1.0, 1.0])
    if colorspace == "yxz":
        xyz = rgb_to_xyz(img)
        return jnp.stack([xyz[..., 1], xyz[..., 0], xyz[..., 2]], axis=-1)
    if colorspace == "gray":
        return rgb_to_gray(img)
    if colorspace == "bgr":
        return img[..., ::-1]
    if colorspace == "rgb":
        return img
    raise NotImplementedError("Colorspace %s is not supported" % colorspace)


def normspace2rgb(img, colorspace):
    """Inverse of rgb2normspace, matching reference normspace2rgb."""
    colorspace = colorspace.lower()
    standard = False
    if len(colorspace) == 4 and colorspace[0] == "s":
        standard = True
        colorspace = colorspace[1:]

    if colorspace == "lab":
        # cv2 saturates LAB2RGB/LUV2RGB float output to [0, 1] (unlike its
        # HLS/HSV/XYZ paths) — measured, see tests/test_transforms_differential
        out = jnp.clip(lab_to_rgb(img * jnp.array([100.0, 255.0, 255.0]) - jnp.array([0.0, 128.0, 128.0])), 0.0, 1.0)
    elif colorspace == "luv":
        out = jnp.clip(luv_to_rgb(img * jnp.array([100.0, 354.0, 262.0]) - jnp.array([0.0, 134.0, 140.0])), 0.0, 1.0)
    elif colorspace == "lsh":
        hls = jnp.stack([img[..., 2], img[..., 0], img[..., 1]], axis=-1) * jnp.array([360.0, 1.0, 1.0])
        out = hls_to_rgb(hls)
    elif colorspace == "hsv":
        out = hsv_to_rgb(img * jnp.array([360.0, 1.0, 1.0]))
    elif colorspace == "yxz":
        out = xyz_to_rgb(jnp.stack([img[..., 1], img[..., 0], img[..., 2]], axis=-1))
    elif colorspace == "rgb":
        out = img
    else:
        raise NotImplementedError("Colorspace %s is not supported" % colorspace)

    if standard:
        return out ** (1.0 / 2.2)
    return out
