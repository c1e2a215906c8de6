// Clean-room LiteImage-compatible shim (see LiteMath.h header comment).
// Implements Image2D<T>, Sampler, ICombinedImageSampler and file I/O with
// the semantics the HydraCore3 reference expects:
//   * bilinear sample at texel centers: ffx = u*w - 0.5
//   * WRAP/CLAMP/BORDER/MIRROR addressing
//   * Image2D<uint32_t> unpacks RGBA bytes to [0,1]; if setSRGB(true) the
//     sampler applies pow(2.2) (Hydra's LDR gamma convention)
#ifndef LITEIMAGE_SHIM_H
#define LITEIMAGE_SHIM_H

#include "LiteMath.h"

#include <vector>
#include <memory>
#include <string>
#include <cmath>
#include <cstdint>

namespace LiteImage
{
  using LiteMath::float2;
  using LiteMath::float3;
  using LiteMath::float4;
  using LiteMath::uint2;
  using LiteMath::clamp;

  struct Sampler
  {
    enum class Filter      { NEAREST = 0, LINEAR = 1, CUBIC = 2 };
    enum class AddressMode { WRAP = 0, CLAMP = 1, BORDER = 2, MIRROR = 3, MIRROR_ONCE = 4 };

    AddressMode addressU = AddressMode::WRAP;
    AddressMode addressV = AddressMode::WRAP;
    AddressMode addressW = AddressMode::WRAP;
    Filter      filter   = Filter::LINEAR;
    float4      borderColor = float4(0, 0, 0, 0);

    bool operator==(const Sampler& o) const
    {
      return addressU == o.addressU && addressV == o.addressV &&
             addressW == o.addressW && filter == o.filter;
    }
  };

  // ------------------------------------------------------------- texel->f4
  static inline float4 TexelToFloat4(uint32_t c)
  {
    return float4(float(c & 0xFF), float((c >> 8) & 0xFF),
                  float((c >> 16) & 0xFF), float((c >> 24) & 0xFF)) * (1.0f / 255.0f);
  }
  static inline float4 TexelToFloat4(float c)  { return float4(c, c, c, c); }
  static inline float4 TexelToFloat4(float4 c) { return c; }

  template<typename T>
  class Image2D
  {
  public:
    Image2D() = default;
    Image2D(unsigned w, unsigned h) : m_width(w), m_height(h), m_data(size_t(w) * h) {}
    Image2D(unsigned w, unsigned h, const T* a_data)
      : m_width(w), m_height(h), m_data(a_data, a_data + size_t(w) * h) {}
    Image2D(unsigned w, unsigned h, T val)
      : m_width(w), m_height(h), m_data(size_t(w) * h, val) {}

    unsigned width()  const { return m_width; }
    unsigned height() const { return m_height; }
    size_t   size()   const { return m_data.size(); }
    unsigned bpp()    const { return unsigned(sizeof(T)); }

    const std::vector<T>& vector() const { return m_data; }
    std::vector<T>&       vector()       { return m_data; }
    const T* data() const { return m_data.data(); }
    T*       data()       { return m_data.data(); }

    void setSRGB(bool v) { m_srgb = v; }
    bool sRGB() const    { return m_srgb; }

    T  pixel(unsigned x, unsigned y) const { return m_data[size_t(y) * m_width + x]; }
    T& pixel(unsigned x, unsigned y)       { return m_data[size_t(y) * m_width + x]; }
    T  operator[](const uint2& xy) const { return pixel(xy.x, xy.y); }
    T& operator[](const uint2& xy)       { return pixel(xy.x, xy.y); }

    void resize(unsigned w, unsigned h)
    { m_width = w; m_height = h; m_data.resize(size_t(w) * h); }

    float4 sample(const Sampler& s, float2 uv) const
    {
      if (m_width == 0 || m_height == 0) return float4(0, 0, 0, 0);
      const float w = float(m_width), h = float(m_height);

      float u = applyAddress1(uv.x, s.addressU);
      float v = applyAddress1(uv.y, s.addressV);

      float4 res;
      if (s.filter == Sampler::Filter::LINEAR)
      {
        const float ffx = u * w - 0.5f;
        const float ffy = v * h - 0.5f;
        int px = int(std::floor(ffx));
        int py = int(std::floor(ffy));
        const float fx = ffx - float(px);
        const float fy = ffy - float(py);

        const int x0 = fixCoord(px, int(m_width), s.addressU);
        const int x1 = fixCoord(px + 1, int(m_width), s.addressU);
        const int y0 = fixCoord(py, int(m_height), s.addressV);
        const int y1 = fixCoord(py + 1, int(m_height), s.addressV);

        const float4 c00 = TexelToFloat4(pixel(x0, y0));
        const float4 c10 = TexelToFloat4(pixel(x1, y0));
        const float4 c01 = TexelToFloat4(pixel(x0, y1));
        const float4 c11 = TexelToFloat4(pixel(x1, y1));
        res = c00 * ((1 - fx) * (1 - fy)) + c10 * (fx * (1 - fy))
            + c01 * ((1 - fx) * fy) + c11 * (fx * fy);
      }
      else
      {
        const int nx = LiteMath::clamp(int(u * w), 0, int(m_width) - 1);
        const int ny = LiteMath::clamp(int(v * h), 0, int(m_height) - 1);
        res = TexelToFloat4(pixel(nx, ny));
      }
      if (m_srgb)
        res = float4(std::pow(res.x, 2.2f), std::pow(res.y, 2.2f),
                     std::pow(res.z, 2.2f), res.w);
      return res;
    }

  private:
    static float applyAddress1(float u, Sampler::AddressMode m)
    {
      switch (m)
      {
        case Sampler::AddressMode::WRAP:   return u - std::floor(u);
        case Sampler::AddressMode::MIRROR: {
          float m2 = 2.0f * (0.5f * u - std::floor(0.5f * u));
          return m2 < 1.0f ? m2 : 2.0f - m2;
        }
        default: return LiteMath::clamp(u, 0.0f, 1.0f);
      }
    }
    static int fixCoord(int i, int n, Sampler::AddressMode m)
    {
      if (m == Sampler::AddressMode::WRAP)
      {
        if (i < 0) return n - 1;
        if (i >= n) return 0;
        return i;
      }
      return LiteMath::clamp(i, 0, n - 1);
    }

    unsigned m_width = 0, m_height = 0;
    bool m_srgb = false;
    std::vector<T> m_data;
  };

  // ------------------------------------------------- combined image sampler
  struct ICombinedImageSampler
  {
    virtual ~ICombinedImageSampler() = default;
    virtual float4 sample(float2 uv) const = 0;
    virtual unsigned width()  const = 0;
    virtual unsigned height() const = 0;
    virtual unsigned bpp()    const = 0;
    virtual const void* data() const = 0;
  };

  template<typename T>
  class CombinedImageSampler : public ICombinedImageSampler
  {
  public:
    CombinedImageSampler(std::shared_ptr<Image2D<T>> img, Sampler s)
      : m_img(img), m_sampler(s) {}
    float4 sample(float2 uv) const override { return m_img->sample(m_sampler, uv); }
    unsigned width()  const override { return m_img->width(); }
    unsigned height() const override { return m_img->height(); }
    unsigned bpp()    const override { return m_img->bpp(); }
    const void* data() const override { return m_img->data(); }
  private:
    std::shared_ptr<Image2D<T>> m_img;
    Sampler m_sampler;
  };

  template<typename T>
  std::shared_ptr<ICombinedImageSampler> MakeCombinedTexture2D(
      std::shared_ptr<Image2D<T>> img, Sampler s)
  { return std::make_shared<CombinedImageSampler<T>>(img, s); }

  // ------------------------------------------------------------- image I/O
  // LoadImage<T>: LDR formats via stb_image; returns empty image on failure.
  template<typename T> Image2D<T> LoadImage(const char* path, float gamma = 2.2f);
  template<> Image2D<uint32_t> LoadImage<uint32_t>(const char* path, float gamma);
  template<> Image2D<float4>   LoadImage<float4>(const char* path, float gamma);

  bool SaveBMP(const char* path, const uint32_t* data, int w, int h);
  bool SaveImage(const char* path, const Image2D<uint32_t>& img, float gamma = 1.0f);
  bool SaveImage(const char* path, const Image2D<float4>& img, float gamma = 2.2f);
}

// the reference code does `using namespace LiteImage;` sparsely but also
// refers to these unqualified via LiteMath's namespace being open:
using LiteImage::Image2D;
using LiteImage::Sampler;
using LiteImage::ICombinedImageSampler;
using LiteImage::MakeCombinedTexture2D;

#endif
