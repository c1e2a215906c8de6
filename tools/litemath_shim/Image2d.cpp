// Clean-room LiteImage shim implementation (see LiteMath.h header comment).
#include "Image2d.h"

#define STB_IMAGE_IMPLEMENTATION
#include "../spectral/3rd_party/stb/stb_image.h"
#define STB_IMAGE_WRITE_IMPLEMENTATION
#include "../spectral/3rd_party/stb/stb_image_write.h"

#include <cstring>

namespace LiteImage
{
  template<>
  Image2D<uint32_t> LoadImage<uint32_t>(const char* path, float /*gamma*/)
  {
    int w = 0, h = 0, ch = 0;
    unsigned char* data = stbi_load(path, &w, &h, &ch, 4);
    if (!data)
      return Image2D<uint32_t>();
    Image2D<uint32_t> img(unsigned(w), unsigned(h),
                          reinterpret_cast<const uint32_t*>(data));
    stbi_image_free(data);
    return img;
  }

  template<>
  Image2D<float4> LoadImage<float4>(const char* path, float /*gamma*/)
  {
    int w = 0, h = 0, ch = 0;
    float* data = stbi_loadf(path, &w, &h, &ch, 4);
    if (!data)
      return Image2D<float4>();
    Image2D<float4> img(unsigned(w), unsigned(h),
                        reinterpret_cast<const float4*>(data));
    stbi_image_free(data);
    return img;
  }

  bool SaveBMP(const char* path, const uint32_t* data, int w, int h)
  {
    return stbi_write_bmp(path, w, h, 4, data) != 0;
  }

  static bool SaveLDRByExt(const char* path, const uint32_t* data, int w, int h)
  {
    const std::string p(path);
    const auto dot = p.find_last_of('.');
    const std::string ext = dot == std::string::npos ? "" : p.substr(dot);
    if (ext == ".png")
      return stbi_write_png(path, w, h, 4, data, w * 4) != 0;
    if (ext == ".jpg" || ext == ".jpeg")
      return stbi_write_jpg(path, w, h, 4, data, 95) != 0;
    return stbi_write_bmp(path, w, h, 4, data) != 0;
  }

  bool SaveImage(const char* path, const Image2D<uint32_t>& img, float /*gamma*/)
  {
    return SaveLDRByExt(path, img.data(), int(img.width()), int(img.height()));
  }

  bool SaveImage(const char* path, const Image2D<float4>& img, float gamma)
  {
    std::vector<uint32_t> ldr(img.size());
    const float invG = 1.0f / gamma;
    for (size_t i = 0; i < img.size(); i++)
    {
      const float4 c = img.data()[i];
      auto to8 = [&](float v) -> uint32_t {
        v = LiteMath::clamp(v, 0.0f, 1.0f);
        return uint32_t(std::pow(v, invG) * 255.0f + 0.5f);
      };
      ldr[i] = to8(c.x) | (to8(c.y) << 8) | (to8(c.z) << 16) | (0xFFu << 24);
    }
    return SaveLDRByExt(path, ldr.data(), int(img.width()), int(img.height()));
  }
}
