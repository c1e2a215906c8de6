// Self-contained CPU ray-tracing backend implementing CrossRT's ISceneObject
// (the Embree3 binary is absent from this environment, only its symlink
// ships).  Used ONLY to build the reference CPU binary for golden images.
// Two-level: median-split BVH2 per mesh (BLAS) + instance loop (TLAS is a
// simple array walk with per-instance world AABB reject; scene sizes here
// are tiny).  Hit conventions copied from the Embree wrapper contract:
// coords[1]=u (barycentric of vertex B), coords[0]=v (of C).
#include "CrossRT.h"
#include "LiteMath.h"

#include <vector>
#include <cfloat>
#include <cmath>
#include <algorithm>
#include <numeric>

using namespace LiteMath;

namespace
{

struct BVHNode
{
  float3 bmin, bmax;
  int left = -1;       // internal: left child (right = left+1); leaf: -1
  int triStart = 0, triCount = 0;
};

struct Mesh
{
  std::vector<float3> v0, e1, e2;   // per-triangle, BVH-leaf order
  std::vector<uint32_t> primId;     // original triangle index
  std::vector<BVHNode> nodes;
  float3 bmin, bmax;
};

struct Instance
{
  uint32_t geomId = 0;
  float4x4 m0, m1;        // motion endpoints (m1 == m0 when static)
  float4x4 inv0, inv1;
  bool hasMotion = false;
  float3 bmin, bmax;      // world bounds over both endpoints
};

inline void triBounds(const Mesh& m, int i, float3& bmin, float3& bmax)
{
  const float3 a = m.v0[i], b = m.v0[i] + m.e1[i], c = m.v0[i] + m.e2[i];
  bmin = min(a, min(b, c));
  bmax = max(a, max(b, c));
}

void buildBVH(Mesh& m)
{
  const int T = int(m.v0.size());
  std::vector<int> order(T);
  std::iota(order.begin(), order.end(), 0);

  m.nodes.clear();
  // iterative construction with explicit left/right stored as (left, left+1)
  // guaranteed by allocating both children together
  struct Todo { int nodeIdx, begin, end; };
  std::vector<Todo> stack;
  m.nodes.push_back(BVHNode());
  stack.push_back({0, 0, T});
  while (!stack.empty())
  {
    Todo t = stack.back(); stack.pop_back();
    BVHNode& node = m.nodes[t.nodeIdx];
    node.bmin = float3(+FLT_MAX); node.bmax = float3(-FLT_MAX);
    for (int i = t.begin; i < t.end; i++)
    {
      float3 bmn, bmx; triBounds(m, order[i], bmn, bmx);
      node.bmin = min(node.bmin, bmn); node.bmax = max(node.bmax, bmx);
    }
    if (t.end - t.begin <= 4)
    {
      node.left = -1; node.triStart = t.begin; node.triCount = t.end - t.begin;
      continue;
    }
    const float3 ext = node.bmax - node.bmin;
    int axis = 0;
    if (ext.y > ext.x) axis = 1;
    if (ext.z > ext[axis]) axis = 2;
    const int mid = (t.begin + t.end) / 2;
    std::nth_element(order.begin() + t.begin, order.begin() + mid,
                     order.begin() + t.end,
      [&](int a, int b) {
        const float ca = m.v0[a][axis] + (m.e1[a][axis] + m.e2[a][axis]) / 3.0f;
        const float cb = m.v0[b][axis] + (m.e1[b][axis] + m.e2[b][axis]) / 3.0f;
        return ca < cb;
      });
    const int l = int(m.nodes.size());
    m.nodes.push_back(BVHNode());
    m.nodes.push_back(BVHNode());
    m.nodes[t.nodeIdx].left = l;
    stack.push_back({l, t.begin, mid});
    stack.push_back({l + 1, mid, t.end});
  }

  // reorder triangles into leaf order so leaves reference contiguous ranges
  std::vector<float3> v0(T), e1(T), e2(T);
  std::vector<uint32_t> pid(T);
  for (int i = 0; i < T; i++)
  {
    v0[i] = m.v0[order[i]]; e1[i] = m.e1[order[i]]; e2[i] = m.e2[order[i]];
    pid[i] = m.primId[order[i]];
  }
  m.v0.swap(v0); m.e1.swap(e1); m.e2.swap(e2); m.primId.swap(pid);

  m.bmin = m.nodes.empty() ? float3(0.0f) : m.nodes[0].bmin;
  m.bmax = m.nodes.empty() ? float3(0.0f) : m.nodes[0].bmax;
}

inline bool slab(const float3& p, const float3& invd, const float3& bmin,
                 const float3& bmax, float tmin, float tmax)
{
  const float3 t0 = (bmin - p) * invd;
  const float3 t1 = (bmax - p) * invd;
  const float3 tn = min(t0, t1), tf = max(t0, t1);
  const float near = std::max(hmax(tn), tmin);
  const float far = std::min(hmin(tf), tmax);
  return near <= far;
}

struct LocalHit { float t = FLT_MAX; int tri = -1; float u = 0, v = 0; };

void traverse(const Mesh& m, const float3& p, const float3& d,
              float tmin, LocalHit& best, bool anyHit, bool& found)
{
  if (m.nodes.empty()) return;
  float3 invd(d.x != 0 ? 1.0f / d.x : 1e30f,
              d.y != 0 ? 1.0f / d.y : 1e30f,
              d.z != 0 ? 1.0f / d.z : 1e30f);
  int stack[64]; int sp = 0;
  stack[sp++] = 0;
  while (sp > 0)
  {
    const BVHNode& n = m.nodes[stack[--sp]];
    if (!slab(p, invd, n.bmin, n.bmax, tmin, best.t))
      continue;
    if (n.left < 0)
    {
      for (int i = n.triStart; i < n.triStart + n.triCount; i++)
      {
        // Moller-Trumbore
        const float3 pv = cross(d, m.e2[i]);
        const float det = dot(pv, m.e1[i]);
        if (std::fabs(det) < 1e-12f) continue;
        const float inv = 1.0f / det;
        const float3 tv = p - m.v0[i];
        const float u = dot(tv, pv) * inv;
        if (u < 0.0f || u > 1.0f) continue;
        const float3 qv = cross(tv, m.e1[i]);
        const float v = dot(d, qv) * inv;
        if (v < 0.0f || u + v > 1.0f) continue;
        const float t = dot(m.e2[i], qv) * inv;
        if (t > tmin && t < best.t)
        {
          best.t = t; best.tri = i; best.u = u; best.v = v;
          found = true;
          if (anyHit) return;
        }
      }
    }
    else if (sp + 2 <= 64)
    {
      stack[sp++] = n.left;
      stack[sp++] = n.left + 1;
    }
  }
}

float4x4 lerpMatrix(const float4x4& a, const float4x4& b, float t)
{
  float4x4 r;
  for (int i = 0; i < 4; i++)
    r.m_col[i] = a.m_col[i] * (1.0f - t) + b.m_col[i] * t;
  return r;
}

class SimpleRT : public ISceneObject
{
public:
  const char* Name() const override { return "SimpleRT"; }

  void ClearGeom() override { m_meshes.clear(); m_instances.clear(); }
  void ClearScene() override { m_instances.clear(); }
  void CommitScene(uint32_t) override {}

  uint32_t AddGeom_Triangles3f(const float* vpos, size_t vertNum,
                               const uint32_t* ind, size_t indNum,
                               uint32_t, size_t vByteStride) override
  {
    const size_t stride = (vByteStride == 0 ? sizeof(float) * 3 : vByteStride)
                          / sizeof(float);
    Mesh m;
    const size_t T = indNum / 3;
    m.v0.resize(T); m.e1.resize(T); m.e2.resize(T); m.primId.resize(T);
    for (size_t t = 0; t < T; t++)
    {
      const float3 a(vpos + ind[3 * t + 0] * stride);
      const float3 b(vpos + ind[3 * t + 1] * stride);
      const float3 c(vpos + ind[3 * t + 2] * stride);
      m.v0[t] = a; m.e1[t] = b - a; m.e2[t] = c - a;
      m.primId[t] = uint32_t(t);
    }
    buildBVH(m);
    m_meshes.push_back(std::move(m));
    return uint32_t(m_meshes.size() - 1);
  }

  void UpdateGeom_Triangles3f(uint32_t geomId, const float* vpos, size_t vertNum,
                              const uint32_t* ind, size_t indNum,
                              uint32_t flags, size_t vByteStride) override
  {
    // rebuild in place (sizes can only shrink per the contract)
    Mesh saved = std::move(m_meshes[geomId]);
    m_meshes[geomId] = Mesh();
    const uint32_t id = AddGeom_Triangles3f(vpos, vertNum, ind, indNum, flags, vByteStride);
    m_meshes[geomId] = std::move(m_meshes[id]);
    m_meshes.pop_back();
  }

  uint32_t AddInstance(uint32_t geomId, const float4x4& matrix) override
  {
    const float4x4 ms[1] = { matrix };
    return AddInstanceMotion(geomId, ms, 1);
  }

  uint32_t AddInstanceMotion(uint32_t geomId, const float4x4* matrices,
                             uint32_t n) override
  {
    Instance inst;
    inst.geomId = geomId;
    inst.m0 = matrices[0];
    inst.m1 = n > 1 ? matrices[n - 1] : matrices[0];
    inst.hasMotion = n > 1;
    inst.inv0 = inverse4x4(inst.m0);
    inst.inv1 = inverse4x4(inst.m1);
    // world bounds: transform the 8 BLAS corners through both endpoints
    const Mesh& m = m_meshes[geomId];
    inst.bmin = float3(+FLT_MAX); inst.bmax = float3(-FLT_MAX);
    for (int corner = 0; corner < 8; corner++)
    {
      const float3 c((corner & 1) ? m.bmax.x : m.bmin.x,
                     (corner & 2) ? m.bmax.y : m.bmin.y,
                     (corner & 4) ? m.bmax.z : m.bmin.z);
      const float3 w0 = inst.m0 * c;
      const float3 w1 = inst.m1 * c;
      inst.bmin = min(inst.bmin, min(w0, w1));
      inst.bmax = max(inst.bmax, max(w0, w1));
    }
    m_instances.push_back(inst);
    return uint32_t(m_instances.size() - 1);
  }

  void UpdateInstance(uint32_t instId, const float4x4& matrix) override
  {
    const uint32_t geomId = m_instances[instId].geomId;
    Instance inst;
    const float4x4 ms[1] = { matrix };
    const uint32_t last = AddInstanceMotion(geomId, ms, 1);
    m_instances[instId] = m_instances[last];
    m_instances.pop_back();
  }

  CRT_Hit RayQuery_NearestHit(float4 posAndNear, float4 dirAndFar) override
  { return RayQuery_NearestHitMotion(posAndNear, dirAndFar, 0.0f); }

  CRT_Hit RayQuery_NearestHitMotion(float4 posAndNear, float4 dirAndFar,
                                    float time) override
  {
    const float3 wp = to_float3(posAndNear);
    const float3 wd = to_float3(dirAndFar);
    const float tmin = posAndNear.w;
    CRT_Hit result;
    result.t = dirAndFar.w;
    result.primId = result.instId = result.geomId = uint32_t(-1);
    result.coords[0] = result.coords[1] = result.coords[2] = result.coords[3] = 0.0f;

    float bestT = dirAndFar.w;
    for (size_t ii = 0; ii < m_instances.size(); ii++)
    {
      const Instance& inst = m_instances[ii];
      // conservative world-space AABB reject
      float3 invd(wd.x != 0 ? 1.0f / wd.x : 1e30f,
                  wd.y != 0 ? 1.0f / wd.y : 1e30f,
                  wd.z != 0 ? 1.0f / wd.z : 1e30f);
      if (!slab(wp, invd, inst.bmin, inst.bmax, tmin, bestT))
        continue;
      float4x4 inv = inst.hasMotion
        ? inverse4x4(lerpMatrix(inst.m0, inst.m1, time)) : inst.inv0;
      const float3 p = inv * wp;
      const float3 d = mul3x3(inv, wd);
      // object-space t equals world-space t only for rigid transforms; keep
      // d unnormalized so t stays in world parametrization
      LocalHit lh; lh.t = bestT;
      bool found = false;
      traverse(m_meshes[inst.geomId], p, d, tmin, lh, false, found);
      if (found && lh.t < bestT)
      {
        bestT = lh.t;
        result.t = lh.t;
        result.primId = m_meshes[inst.geomId].primId[lh.tri];
        result.instId = uint32_t(ii);
        result.geomId = inst.geomId;
        result.coords[1] = lh.u;
        result.coords[0] = lh.v;
        result.coords[2] = 1.0f - lh.u - lh.v;
      }
    }
    return result;
  }

  bool RayQuery_AnyHit(float4 posAndNear, float4 dirAndFar) override
  { return RayQuery_AnyHitMotion(posAndNear, dirAndFar, 0.0f); }

  bool RayQuery_AnyHitMotion(float4 posAndNear, float4 dirAndFar,
                             float time) override
  {
    const float3 wp = to_float3(posAndNear);
    const float3 wd = to_float3(dirAndFar);
    const float tmin = posAndNear.w;
    for (size_t ii = 0; ii < m_instances.size(); ii++)
    {
      const Instance& inst = m_instances[ii];
      float3 invd(wd.x != 0 ? 1.0f / wd.x : 1e30f,
                  wd.y != 0 ? 1.0f / wd.y : 1e30f,
                  wd.z != 0 ? 1.0f / wd.z : 1e30f);
      if (!slab(wp, invd, inst.bmin, inst.bmax, tmin, dirAndFar.w))
        continue;
      float4x4 inv = inst.hasMotion
        ? inverse4x4(lerpMatrix(inst.m0, inst.m1, time)) : inst.inv0;
      const float3 p = inv * wp;
      const float3 d = mul3x3(inv, wd);
      LocalHit lh; lh.t = dirAndFar.w;
      bool found = false;
      traverse(m_meshes[inst.geomId], p, d, tmin, lh, true, found);
      if (found) return true;
    }
    return false;
  }

private:
  std::vector<Mesh> m_meshes;
  std::vector<Instance> m_instances;
};

}  // namespace

ISceneObject* CreateEmbreeRT() { return new SimpleRT; }
ISceneObject* CreateSceneRT(const char*) { return new SimpleRT; }
void DeleteSceneRT(ISceneObject* p) { delete p; }
