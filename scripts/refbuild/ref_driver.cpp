// Golden-oracle driver: runs the COMPILED REFERENCE library
// (/root/reference/RSLightFields, built unmodified by build_reference.sh)
// on a folder of frames and dumps its raw outputs to YML so the TPU
// engine can be compared against the real binary, not a transliteration.
//
// Usage:
//   ref_driver <frames_folder> <ext> <dmin> <dmax> <dim_d> <mode> <outdir>
// mode: "2d"  -> Depth2DComputer<float>: depth_###, valid_###, dispconf_###
//       "ftc" -> FineToCoarse<float>:    fused_###, fvalid_###
// All outputs are one YML per frame index s.
#include <rslf.hpp>

#include <cstdio>
#include <cstdlib>
#include <string>

static std::string idx_name(const char* stem, int s) {
    char buf[64];
    std::snprintf(buf, sizeof(buf), "%s_%03d", stem, s);
    return std::string(buf);
}

int main(int argc, char** argv) {
    if (argc < 8) {
        std::fprintf(stderr,
                     "usage: %s folder ext dmin dmax dim_d 2d|ftc outdir\n",
                     argv[0]);
        return 2;
    }
    const std::string folder = argv[1];
    const std::string ext = argv[2];
    const float dmin = std::strtof(argv[3], nullptr);
    const float dmax = std::strtof(argv[4], nullptr);
    const int dim_d = std::atoi(argv[5]);
    const std::string mode = argv[6];
    const std::string outdir = argv[7];

    auto imgs = rslf::read_imgs_from_folder(folder, ext,
                                            CV_LOAD_IMAGE_UNCHANGED);
    if (imgs.empty()) {
        std::fprintf(stderr, "no frames found in %s\n", folder.c_str());
        return 1;
    }
    const int channels = imgs[0].channels();
    auto epis = rslf::build_epis_from_imgs(imgs);
    const int S = epis[0].cols > 0 ? epis[0].rows : 0;

    if (channels == 3 && mode == "ftc") {
        // RGB path: the library's cv::Vec3f instantiations
        // (rslf_depth_computation.hpp _3ch aliases)
        rslf::FineToCoarse<cv::Vec3f> ftc(epis, dmin, dmax, dim_d);
        ftc.run();
        rslf::Vec<rslf::Mat> maps, validity;
        ftc.get_results(maps, validity);
        for (int s = 0; s < (int)maps.size(); ++s) {
            rslf::write_mat_to_yml(maps[s], outdir, idx_name("fused", s));
            rslf::write_mat_to_yml(validity[s], outdir,
                                   idx_name("fvalid", s));
        }
        return 0;
    }
    if (channels == 3 && mode == "2d") {
        rslf::Depth2DComputer<cv::Vec3f> comp(epis, dmin, dmax, dim_d);
        comp.run();
        const auto& depths = comp.get_depths_s_v_u();
        const auto& masks = comp.get_valid_depths_mask_s_v_u();
        for (int s = 0; s < S; ++s) {
            rslf::write_mat_to_yml(depths[s], outdir, idx_name("depth", s));
            rslf::write_mat_to_yml(masks[s], outdir, idx_name("valid", s));
            rslf::write_mat_to_yml(comp.m_disp_confidence_s_v_u[s], outdir,
                                   idx_name("dispconf", s));
            rslf::write_mat_to_yml(comp.m_edge_confidence_s_v_u[s], outdir,
                                   idx_name("edgeconf", s));
        }
        return 0;
    }

    if (mode == "2d") {
        rslf::Depth2DComputer<float> comp(epis, dmin, dmax, dim_d);
        comp.run();
        const auto& depths = comp.get_depths_s_v_u();
        const auto& masks = comp.get_valid_depths_mask_s_v_u();
        for (int s = 0; s < S; ++s) {
            rslf::write_mat_to_yml(depths[s], outdir, idx_name("depth", s));
            rslf::write_mat_to_yml(masks[s], outdir, idx_name("valid", s));
            rslf::write_mat_to_yml(comp.m_disp_confidence_s_v_u[s], outdir,
                                   idx_name("dispconf", s));
            rslf::write_mat_to_yml(comp.m_edge_confidence_s_v_u[s], outdir,
                                   idx_name("edgeconf", s));
        }
    } else if (mode == "ftc") {
        rslf::FineToCoarse<float> ftc(epis, dmin, dmax, dim_d);
        ftc.run();
        rslf::Vec<rslf::Mat> maps, validity;
        ftc.get_results(maps, validity);
        for (int s = 0; s < (int)maps.size(); ++s) {
            rslf::write_mat_to_yml(maps[s], outdir, idx_name("fused", s));
            rslf::write_mat_to_yml(validity[s], outdir,
                                   idx_name("fvalid", s));
        }
    } else {
        std::fprintf(stderr, "unknown mode %s\n", mode.c_str());
        return 2;
    }
    return 0;
}
