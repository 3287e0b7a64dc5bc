// Shared signal machinery for the worldline f0 extractors (DIO fast path
// and the Harvest parity extractor). Clean-room code, implemented from the
// published algorithm descriptions (Morise 2009/2016/2017), not ported from
// any existing implementation.
//
// The core performance idea: every per-channel filtered signal is band
// limited to a small multiple of its boundary frequency, so instead of one
// full-length IFFT per channel (the naive O(channels * N log N)), each
// channel is materialized at a DECIMATED rate via spectral truncation —
// keep only the lowest m bins of the signal's FFT, IFFT at size m — and the
// Nuttall-windowed filter is applied as a SHORT time-domain FIR at that
// rate (4 boundary periods ~ 25 taps at 6x-boundary sampling). Event times
// (zero crossings / extrema) come out in seconds, so downstream frame
// interpolation never sees the per-channel rate.
#pragma once

#include <algorithm>
#include <cmath>
#include <vector>

#include "fft.h"

namespace worldline {

// Nuttall window (continuous-first-derivative variant), x in [0, 1].
inline double nuttall(double x) {
  const double a0 = 0.355768, a1 = 0.487396, a2 = 0.144232, a3 = 0.012604;
  return a0 - a1 * std::cos(2.0 * M_PI * x) + a2 * std::cos(4.0 * M_PI * x) -
         a3 * std::cos(6.0 * M_PI * x);
}

struct SignalSpectrum {
  std::vector<cplx> half;  // bins 0..nfft/2 of the zero-padded signal's FFT
                           // (real input: negative bins are conjugates)
  size_t nfft;
  int n;   // original sample count
  int fs;  // sample rate
};

inline SignalSpectrum make_spectrum(const double* x, int n, int fs,
                                    double f0_floor) {
  SignalSpectrum s;
  s.n = n;
  s.fs = fs;
  // pad so the longest filter (4 periods of f0_floor) cannot wrap
  s.nfft = next_pow2(static_cast<size_t>(n) +
                     static_cast<size_t>(fs / f0_floor * 4.0) + 2);
  // real-input FFT via even/odd complex packing: one nfft/2-point FFT
  const size_t h = s.nfft / 2;
  std::vector<cplx> z(h, cplx(0.0, 0.0));
  for (int i = 0; i < n; ++i) {
    if (i & 1)
      z[i >> 1] += cplx(0.0, x[i]);
    else
      z[i >> 1] += cplx(x[i], 0.0);
  }
  fft(z, false);
  s.half.resize(h + 1);
  for (size_t k = 0; k <= h; ++k) {
    const cplx zk = (k == h) ? z[0] : z[k];
    const cplx zc = std::conj(z[(h - k) % h]);
    const cplx even = 0.5 * (zk + zc);
    const cplx odd = 0.5 * (zk - zc);  // still multiplied by i internally
    const double ang = -2.0 * M_PI * static_cast<double>(k) / s.nfft;
    const cplx tw(std::cos(ang), std::sin(ang));
    // X[k] = E[k] + e^{-2pi i k/N} * O[k], O[k] = -i * odd
    s.half[k] = even + tw * cplx(odd.imag(), -odd.real());
  }
  return s;
}

struct BandSignal {
  std::vector<double> y;  // filtered signal, decimated
  double rate;            // samples / second of y
};

// Materialize the signal at ~oversample*band_edge_hz sampling via spectral
// truncation. band_edge_hz is the highest frequency the caller's filter
// keeps; content above rate/2 is cut by the truncation itself (implicit
// ideal low-pass), which is harmless because the subsequent FIR attenuates
// the truncation edge by the Nuttall sidelobe floor.
inline BandSignal decimated_signal(const SignalSpectrum& s,
                                   double band_edge_hz, double oversample) {
  BandSignal out;
  const double want_rate = std::min<double>(s.fs, oversample * band_edge_hz);
  size_t m = next_pow2(static_cast<size_t>(
      std::ceil(s.nfft * want_rate / s.fs)));
  m = std::min(m, s.nfft);
  m = std::max<size_t>(m, 64);
  out.rate = static_cast<double>(s.fs) * m / s.nfft;

  const double scale = static_cast<double>(m) / s.nfft;
  std::vector<cplx> t(m, cplx(0.0, 0.0));
  t[0] = cplx(0.0, 0.0);  // DC removed so zero crossings are meaningful
  for (size_t k = 1; k < m / 2; ++k) {
    t[k] = s.half[k] * scale;
    t[m - k] = std::conj(s.half[k]) * scale;  // real signal: X[-k] = X[k]*
  }
  fft(t, true);
  const size_t n_dec = std::min<size_t>(
      m, static_cast<size_t>(std::ceil(static_cast<double>(s.n) * m / s.nfft)) + 1);
  out.y.resize(n_dec);
  for (size_t i = 0; i < n_dec; ++i) out.y[i] = t[i].real();
  return out;
}

// In-place centered FIR with zero-padded edges.
inline void fir_filter(std::vector<double>* y, const std::vector<double>& k) {
  const int n = static_cast<int>(y->size());
  const int half = static_cast<int>(k.size()) / 2;
  std::vector<double> out(n, 0.0);
  for (int i = 0; i < n; ++i) {
    double acc = 0.0;
    const int j0 = std::max(0, half - i);
    const int j1 = std::min<int>(k.size(), n + half - i);
    for (int j = j0; j < j1; ++j) acc += k[j] * (*y)[i + j - half];
    out[i] = acc;
  }
  *y = std::move(out);
}

// Integer-factor decimation with a windowed-sinc anti-alias low-pass,
// computing only the strided outputs.
inline std::vector<double> decimate_signal(const double* x, int n, int factor,
                                           int fs);

// Nuttall-windowed cosine band-pass at `center_hz`, length 4 periods + 1
// (2 periods each side) at the signal's rate.
inline std::vector<double> bandpass_kernel(double center_hz, double rate) {
  const int half = std::max(2, static_cast<int>(std::round(rate / center_hz * 2.0)));
  std::vector<double> k(2 * half + 1);
  for (int i = -half; i <= half; ++i) {
    const double w = nuttall(0.5 + 0.5 * static_cast<double>(i) / half);
    k[i + half] = w * std::cos(2.0 * M_PI * center_hz * i / rate);
  }
  return k;
}

// Nuttall-windowed sinc low-pass with cutoff `cutoff_hz`, 2 periods each side.
inline std::vector<double> lowpass_kernel(double cutoff_hz, double rate) {
  const int half = std::max(2, static_cast<int>(std::round(rate / cutoff_hz * 2.0)));
  const double omega = 2.0 * M_PI * cutoff_hz / rate;
  std::vector<double> k(2 * half + 1);
  double dc = 0.0;
  for (int i = -half; i <= half; ++i) {
    const double w = nuttall(0.5 + 0.5 * static_cast<double>(i) / half);
    const double sinc = (i == 0) ? omega / M_PI : std::sin(omega * i) / (M_PI * i);
    k[i + half] = w * sinc;
    dc += k[i + half];
  }
  for (double& v : k) v /= std::max(dc, 1e-12);
  return k;
}

// Channels are differentiated only by their short FIR — the decimated base
// signal depends on nothing but the truncation size m, so consecutive
// channels that land in the same power-of-two bucket share one IFFT.
struct BandCache {
  size_t m = 0;
  BandSignal sig;
};

inline BandSignal decimated_signal_cached(const SignalSpectrum& s,
                                          double band_edge_hz,
                                          double oversample,
                                          BandCache* cache) {
  const double want_rate = std::min<double>(s.fs, oversample * band_edge_hz);
  size_t m = next_pow2(static_cast<size_t>(std::ceil(s.nfft * want_rate / s.fs)));
  m = std::min(m, s.nfft);
  m = std::max<size_t>(m, 64);
  if (cache->m != m) {
    cache->sig = decimated_signal(s, band_edge_hz, oversample);
    cache->m = m;
  }
  return cache->sig;  // copy: callers filter in place
}

inline std::vector<double> decimate_signal(const double* x, int n, int factor,
                                           int fs) {
  if (factor <= 1) return std::vector<double>(x, x + n);
  const double out_rate = static_cast<double>(fs) / factor;
  const std::vector<double> k = lowpass_kernel(0.4 * out_rate, fs);
  const int half = static_cast<int>(k.size()) / 2;
  std::vector<double> out((n + factor - 1) / factor);
  for (size_t o = 0; o < out.size(); ++o) {
    const int c = static_cast<int>(o) * factor;
    const int j0 = std::max(0, half - c);
    const int j1 = std::min<int>(static_cast<int>(k.size()), n + half - c);
    double acc = 0.0;
    for (int j = j0; j < j1; ++j) acc += k[j] * x[c + j - half];
    out[o] = acc;
  }
  return out;
}

// ---------------------------------------------------------------------------
// Interval events (the four DIO/Harvest event families).

struct Events {
  std::vector<double> times;  // event midpoint times (s)
  std::vector<double> f0;     // 1 / interval (Hz)
};

// Zero-crossing events with linear sub-sample interpolation. rising=true
// detects -..+ crossings; sign flips / the first difference yield the other
// three families.
inline Events interval_events(const std::vector<double>& y, double rate,
                              bool rising) {
  Events ev;
  std::vector<double> cross;
  const int n = static_cast<int>(y.size());
  for (int i = 0; i < n - 1; ++i) {
    const double a = rising ? y[i] : -y[i];
    const double b = rising ? y[i + 1] : -y[i + 1];
    if (a < 0.0 && b >= 0.0) {
      const double frac = a / (a - b);
      cross.push_back((i + frac) / rate);
    }
  }
  for (size_t i = 0; i + 1 < cross.size(); ++i) {
    const double interval = cross[i + 1] - cross[i];
    if (interval <= 0.0) continue;
    ev.times.push_back(0.5 * (cross[i] + cross[i + 1]));
    ev.f0.push_back(1.0 / interval);
  }
  return ev;
}

inline Events extremum_events(const std::vector<double>& y, double rate,
                              bool peaks) {
  if (y.size() < 2) return Events{};
  std::vector<double> dy(y.size() - 1);
  for (size_t i = 0; i + 1 < y.size(); ++i) dy[i] = y[i + 1] - y[i];
  return interval_events(dy, rate, /*rising=*/!peaks);
}

// All four event families in ONE pass over the band signal (same results as
// interval_events x2 + extremum_events x2, which re-scan y four times — the
// scans are memory-bound, so fusing them is ~4x cheaper on long signals).
// out[0]=rising, out[1]=falling, out[2]=peaks, out[3]=dips.
inline void all_interval_events(const std::vector<double>& y, double rate,
                                Events out[4]) {
  for (int k = 0; k < 4; ++k) out[k] = Events{};
  const int n = static_cast<int>(y.size());
  if (n < 3) return;
  double last_cross[4] = {-1.0, -1.0, -1.0, -1.0};
  auto emit = [&](int k, double t) {
    if (last_cross[k] >= 0.0) {
      const double interval = t - last_cross[k];
      if (interval > 0.0) {
        out[k].times.push_back(0.5 * (last_cross[k] + t));
        out[k].f0.push_back(1.0 / interval);
      }
    }
    last_cross[k] = t;
  };
  for (int i = 0; i < n - 1; ++i) {
    const double a = y[i], b = y[i + 1];
    if (a < 0.0 && b >= 0.0) emit(0, (i + a / (a - b)) / rate);
    if (a > 0.0 && b <= 0.0) emit(1, (i + a / (a - b)) / rate);
    if (i < n - 2) {
      const double da = b - a, db = y[i + 2] - b;
      // extremum_events(peaks) == interval_events(dy, rising=false)
      if (da > 0.0 && db <= 0.0) emit(2, (i + da / (da - db)) / rate);
      if (da < 0.0 && db >= 0.0) emit(3, (i + da / (da - db)) / rate);
    }
  }
}

// Linear interpolation of (times, values) onto frame times; out-of-range -> 0.
inline void interp_to_frames(const Events& ev,
                             const std::vector<double>& frame_times,
                             std::vector<double>* out) {
  const size_t m = ev.times.size();
  out->assign(frame_times.size(), 0.0);
  if (m < 2) return;
  size_t j = 0;
  for (size_t i = 0; i < frame_times.size(); ++i) {
    const double t = frame_times[i];
    if (t < ev.times.front() || t > ev.times.back()) continue;
    while (j + 2 < m && ev.times[j + 1] < t) ++j;
    const double t0 = ev.times[j], t1 = ev.times[j + 1];
    const double w = (t1 > t0) ? (t - t0) / (t1 - t0) : 0.0;
    (*out)[i] = ev.f0[j] + w * (ev.f0[j + 1] - ev.f0[j]);
  }
}

// ---------------------------------------------------------------------------
// Instantaneous-frequency refinement.
//
// Single-bin windowed DFTs S0 (at the frame) and S1 (signal advanced one
// sample) give the dominant frequency inside the bin as
// arg(S1 * conj(S0)) * fs / 2pi. Harmonics are magnitude-weighted. All
// trigonometry runs on complex-rotation recurrences: one rotation for the
// DFT phasor and one for the window phase (Nuttall terms come from
// Chebyshev identities on its cosine), so the inner loop is multiply-adds
// only — this is what makes refining ~10^5 (frame, candidate) pairs viable.

struct Refined {
  double f0 = 0.0;
  double score = 0.0;  // harmonic-consistency reliability (bigger = better)
  double amp2 = 0.0;   // sum of squared harmonic amplitudes (window-normalized,
                       // comparable across candidates with different windows)
  double snr = 0.0;    // amp2 / squared amplitude at the half-integer slots —
                       // harmonic stack vs the local noise floor. Low-f0
                       // candidates riding broadband rumble/reverb measure
                       // large amp2 but low snr; a clean voice measures huge
                       // snr even when faint.
};

inline Refined refine_f0(const double* x, int n, int fs, double t, double f0,
                         double f0_floor, double f0_ceil, int max_harmonics,
                         int iterations, double window_periods,
                         bool subharmonic_check = false) {
  Refined r;
  if (f0 <= 0.0) return r;
  const int center = static_cast<int>(std::round(t * fs));
  double est = f0;
  double score = 0.0;
  for (int iter = 0; iter < iterations; ++iter) {
    const int half = static_cast<int>(std::round(window_periods * fs / est)) + 1;
    const int lo = std::max(-half, -center);
    const int hi = std::min(half, n - 2 - center);
    if (hi <= lo) return r;

    const int n_harm = std::min<int>(
        max_harmonics, static_cast<int>(std::floor(0.5 * fs / est)));
    if (n_harm < 1) return r;

    double num = 0.0, den = 0.0;
    double inst_buf[16], mag_buf[16];
    int harm_buf[16];
    int used = 0;
    // Pseudo-slots h=-1/h=0 probe 0.5*est and 1.5*est (magnitude only): for
    // the TRUE fundamental both half-integer slots are empty, while an
    // octave-up error has real energy at both (they are harmonics of the
    // actual f0). Emptiness of the ODD integer slots relative to the evens
    // catches the subharmonic (half-f0) error. Neither error is caught by
    // the deviation score — both leave the weighted instantaneous-frequency
    // consensus perfectly self-consistent.
    double inharm_mag = 0.0;
    double win_sum = 0.0, win2_sum = 0.0, xwin2 = 0.0;  // filled on h == 1
    const int h_start = subharmonic_check ? -1 : 1;
    for (int h = h_start; h <= n_harm && used < 16; ++h) {
      const double freq_h = (h == -1) ? 0.5 * est : (h == 0 ? 1.5 * est : est * h);
      if (h <= 0 && freq_h >= 0.5 * fs) continue;
      const double omega = 2.0 * M_PI * freq_h / fs;
      // DFT phasor e^{-i omega i}, started at i = lo
      double pr = std::cos(omega * lo), pi = -std::sin(omega * lo);
      const double cr = std::cos(omega), ci = -std::sin(omega);
      // window phase phi = pi * (i + half) / half, started at i = lo
      const double dphi = M_PI / half;
      double wr = std::cos(dphi * (lo + half)), wi = std::sin(dphi * (lo + half));
      const double wcr = std::cos(dphi), wci = std::sin(dphi);

      double s0r = 0.0, s0i = 0.0, s1r = 0.0, s1i = 0.0;
      double w_sum = 0.0, w2_sum = 0.0, xw2_sum = 0.0;
      const bool measure_energy = (h == 1 && subharmonic_check);
      const double* xs = x + center;
      for (int i = lo; i <= hi; ++i) {
        // nuttall(x), x = (i+half)/(2*half): cos(2 pi x) = cos(phi_i) with
        // phi_i = pi*(i+half)/half tracked by the (wr, wi) rotation; higher
        // terms via Chebyshev identities
        const double c1 = wr;                  // cos(2 pi x)
        const double c2 = 2.0 * wr * wr - 1.0; // cos(4 pi x)
        const double c3 = wr * (4.0 * wr * wr - 3.0);
        const double w = 0.355768 - 0.487396 * c1 + 0.144232 * c2 - 0.012604 * c3;
        const double a = xs[i] * w, b = xs[i + 1] * w;
        s0r += a * pr; s0i += a * pi;
        s1r += b * pr; s1i += b * pi;
        if (measure_energy) {
          w_sum += w;
          w2_sum += w * w;
          xw2_sum += a * a;
        }
        // rotate phasors
        const double npr = pr * cr - pi * ci;
        pi = pr * ci + pi * cr; pr = npr;
        const double nwr = wr * wcr - wi * wci;
        wi = wr * wci + wi * wcr; wr = nwr;
      }
      const double mag = std::sqrt(s0r * s0r + s0i * s0i);
      if (measure_energy) {
        win_sum = w_sum;
        win2_sum = w2_sum;
        xwin2 = xw2_sum;
      }
      if (h <= 0) {
        inharm_mag = std::max(inharm_mag, mag);
        continue;
      }
      if (mag < 1e-12) continue;
      // arg(S1 * conj(S0))
      const double xr = s1r * s0r + s1i * s0i;
      const double xi = s1i * s0r - s1r * s0i;
      const double inst = std::atan2(xi, xr) * fs / (2.0 * M_PI);
      if (inst <= 0.0) continue;
      inst_buf[used] = inst;
      mag_buf[used] = mag;
      harm_buf[used] = h;
      num += mag * inst;
      den += mag * h;
      ++used;
    }
    if (den < 1e-12 || used == 0) return r;
    const double refined = num / den;
    if (!(refined > 0.0) || std::fabs(refined - est) / est > 0.2) {
      // wildly inconsistent -> keep previous estimate, low score
      r.f0 = est;
      r.score = 0.0;
      return r;
    }
    // reliability: magnitude-weighted relative deviation of the per-harmonic
    // instantaneous frequencies from the consensus
    double dev = 0.0, wsum = 0.0, odd_sum = 0.0, max_mag = 0.0;
    for (int k = 0; k < used; ++k) {
      dev += mag_buf[k] * std::fabs(inst_buf[k] / harm_buf[k] - refined);
      wsum += mag_buf[k];
      if (harm_buf[k] % 2 == 1) odd_sum += mag_buf[k];
      max_mag = std::max(max_mag, mag_buf[k]);
    }
    score = 1.0 / (1e-12 + dev / std::max(wsum, 1e-12) / refined);
    if (subharmonic_check && wsum > 0.0) {
      score *= std::min(1.0, 2.0 * odd_sum / wsum);
      const double hr = inharm_mag / std::max(max_mag, 1e-12);
      score /= 1.0 + 25.0 * hr * hr;
      // generalized subharmonic test: if every SIGNIFICANT harmonic index
      // shares a common divisor g > 1 (e.g. only slots {3, 6} populated ->
      // the candidate is the true f0 / 3), the spectrum is fully explained
      // by g * candidate — the consensus is self-consistent but wrong
      int g = 0;
      for (int k = 0; k < used; ++k) {
        if (mag_buf[k] < 0.1 * max_mag) continue;
        int b = harm_buf[k];
        while (b) { const int tmp = g % b; g = b; b = tmp; }  // gcd
      }
      if (g > 1) score *= 0.02;
      // harmonic-stack amplitude (per sinusoid: mag = A*sum(w)/2): the
      // amplitude evidence for this candidate, window-normalized so
      // candidates with different window lengths compare fairly. The CALLER
      // weighs it against competing candidates — a faint-but-clean
      // periodicity (instrument bleed, hum) is perfectly self-consistent,
      // so consistency alone is amplitude-blind.
      if (win_sum > 0.0) {
        double stack = 0.0;
        for (int k = 0; k < used; ++k) stack += mag_buf[k] * mag_buf[k];
        r.amp2 = 4.0 * stack / (win_sum * win_sum);
        const double noise_a2 =
            4.0 * inharm_mag * inharm_mag / (win_sum * win_sum);
        r.snr = r.amp2 / (noise_a2 + 1e-18);
      }
      (void)win2_sum;
      (void)xwin2;
    }
    est = refined;
  }
  if (est < f0_floor || est > f0_ceil) return r;
  r.f0 = est;
  r.score = score;
  return r;
}

}  // namespace worldline
